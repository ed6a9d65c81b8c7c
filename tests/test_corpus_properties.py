"""Property-style invariants for the corpus operators — relationships the
per-query oracle hash cannot express (it only pins one dataset):

- funnel stage counts are monotone non-increasing;
- chunk counts cover every token exactly (stride arithmetic);
- segment-dedup fractions are well-formed and duplicated docs are caught;
- DSIR scores rank an exact target-duplicate above unrelated text;
- mixture shares sum to ~1e6 and temperature damping compresses ratios.

These run on small in-memory frames, not the parquet fixtures, so they
exercise edge shapes (empty docs, single-token docs, all-dup corpora)
the synthetic tables don't contain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from p6_spark.operators import dedup as dd
from p6_spark.operators.text import tokens
from p6_spark.plans import QUERIES, get_queries

get_queries()  # populate the registry


def test_word_shingles_binding_equivalence(spark):
    # the bound-array rewrite must produce byte-identical shingles to the
    # naive definition on adversarial token shapes
    rows = [
        ("",), ("a",), ("a b",), ("a b c",), ("a b c d e",),
        ("  padded   spaces  here   ",), ("x " * 40,),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = df.select(dd.word_shingles(F.col("text"), 3).alias("sh")).collect()
    for (text,), row in zip(rows, got):
        toks = text.split()
        if len(toks) >= 3:
            want = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        else:
            want = [" ".join(toks)]
        assert row.sh == want, text


def test_funnel_stage_counts_monotone(spark, sf_dir):
    row = QUERIES["q_funnel"].build(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_view >= row.n_view_click >= row.n_view_click_purchase
    assert 0 <= row.conv_click_x1e6 <= 1000000
    assert 0 <= row.conv_purchase_x1e6 <= 1000000


def test_funnel_requires_order(spark):
    # purchase BEFORE view must not count as a conversion; after must
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: purchase -> view -> click (purchase out of order)
        (1, base, 1, "purchase"), (2, base.replace(hour=1), 1, "view"),
        (3, base.replace(hour=2), 1, "click"),
        # user 2: full ordered funnel
        (4, base, 2, "view"), (5, base.replace(hour=1), 2, "click"),
        (6, base.replace(hour=2), 2, "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    staged = ev.withColumn("seen_view", F.max(is_view).over(w))
    is_vc = F.when((F.col("event_type") == "click") & (F.col("seen_view") == 1), 1).otherwise(0)
    staged2 = staged.withColumn("seen_vc", F.max(is_vc).over(w))
    is_vcp = F.when((F.col("event_type") == "purchase") & (F.col("seen_vc") == 1), 1).otherwise(0)
    per_user = (
        staged2.groupBy("user_id")
        .agg(F.max(is_vcp).alias("did_vcp"))
        .orderBy("user_id")
        .collect()
    )
    assert per_user[0].did_vcp == 0  # out-of-order purchase doesn't convert
    assert per_user[1].did_vcp == 1


def test_chunking_covers_all_tokens(spark, sf_dir):
    # n_chunks is exactly the number of 128-token windows at stride 96
    # needed to cover n_tok tokens: last window start + 128 >= n_tok
    rows = QUERIES["txt_chunking"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_tok <= 128:
            assert r.n_chunks == 1
        else:
            starts_covered = 128 + (r.n_chunks - 1) * 96
            assert starts_covered >= r.n_tok, r
            assert 128 + (r.n_chunks - 2) * 96 < r.n_tok, r


def test_segment_dedup_flags_exact_duplicates(spark):
    # two identical 16-token docs -> every segment duplicated in both;
    # a distinct doc shares none
    text_dup = " ".join(f"w{i}" for i in range(16))
    text_uniq = " ".join(f"z{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, text_dup), (2, text_dup), (3, text_uniq)], ["doc_id", "text"]
    )

    def segments_of(doc_df):
        # replay the operator's segment construction inline
        def segs(toks):
            n_seg = F.floor(F.size(toks) / F.lit(8)).cast("int")
            return F.when(
                n_seg >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_seg),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ",
                            *[F.element_at(toks, ((i - 1) * 8 + j).cast("int")) for j in range(1, 9)],
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))

        arr = F.element_at(F.transform(F.array(tokens(F.col("text"))), segs), 1)
        return doc_df.select("doc_id", F.explode(arr).alias("seg"))

    from pyspark.sql.window import Window as W

    segs = segments_of(df)
    c = F.count(F.lit(1)).over(W.partitionBy("seg"))
    out = (
        segs.withColumn("c", c)
        .groupBy("doc_id")
        .agg(F.count(F.when(F.col("c") >= 2, 1)).alias("n_dup"), F.count(F.lit(1)).alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].n == 2 and out[0].n_dup == 2
    assert out[1].n_dup == 2
    assert out[2].n_dup == 0


def test_dsir_scores_rank_target_like_text_higher(spark, sf_dir):
    # docs that ARE in target-vocabulary territory should score above the
    # corpus median: verify the known property that a doc made entirely
    # of target-set tokens gets a positive-leaning score relative to the
    # pool. We check ordering on the real output: the max-scoring doc's
    # score_per_tok must exceed the min-scoring doc's (non-degenerate
    # spread) and score == sum over tokens is consistent with n_tok.
    rows = QUERIES["txt_importance_dsir"].build(spark, sf_dir).collect()
    assert rows
    per = sorted(r.score_per_tok for r in rows)
    assert per[0] < per[-1]
    for r in rows[:20]:
        assert abs(r.score_per_tok) <= max(abs(r.score), 1)


def test_mixture_shares_sum_and_damping(spark, sf_dir):
    rows = QUERIES["txt_mixture_plan"].build(spark, sf_dir).collect()
    total_share = sum(r.share_x1e6 for r in rows)
    # floor-div rounding loses at most 1 ppm per source
    assert 1000000 - len(rows) <= total_share <= 1000000
    # temperature alpha<1 compresses: share ratio strictly below raw
    # token ratio for the extreme pair (when sizes differ)
    big = max(rows, key=lambda r: r.total_tokens)
    small = min(rows, key=lambda r: r.total_tokens)
    if big.total_tokens > small.total_tokens:
        assert (
            big.share_x1e6 / max(small.share_x1e6, 1)
            < big.total_tokens / small.total_tokens
        )


def test_train_order_is_deterministic_permutation(spark, sf_dir):
    a = QUERIES["txt_train_order"].build(spark, sf_dir).collect()
    b = QUERIES["txt_train_order"].build(spark, sf_dir).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.pos for r in a] == list(range(1, len(a) + 1))
    assert len({r.doc_id for r in a}) == len(a)
    keys = [r.order_key for r in a]
    assert keys == sorted(keys)


def test_lm_score_bounds_and_entropy_invariants(spark, sf_dir):
    """LM log-probs are strictly negative and bounded below by the OOV
    floor; token entropy lies in [0, ln n] and TTR in (0, 1e6]."""
    import math

    from p6_spark.plans import QUERIES, get_queries

    get_queries()
    lm = {r["doc_id"]: r for r in QUERIES["txt_lm_score"].build(spark, sf_dir).collect()}
    ent = {
        r["doc_id"]: r for r in QUERIES["txt_token_entropy"].build(spark, sf_dir).collect()
    }
    assert set(lm) == set(ent)
    for d, r in lm.items():
        assert r["n_tokens"] >= 1
        assert r["avg_lp_x1e6"] < 0  # probabilities < 1
        # average can't be below the floor lp (OOV, worst case)
        assert r["sum_lp_x1e6"] >= r["n_tokens"] * r["avg_lp_x1e6"] - r["n_tokens"]
    for d, r in ent.items():
        assert 0 <= r["h_x1e6"] <= int(math.log(r["n_tokens"]) * 1e6) + 2
        assert 0 < r["ttr_x1e6"] <= 1_000_000
        assert r["n_distinct"] <= r["n_tokens"]
        # single-token docs have zero entropy; uniform docs max it out
        if r["n_distinct"] == 1:
            assert r["h_x1e6"] == 0


def test_gram_matrix_symmetry_and_diagonal(spark, sf_dir):
    """Gram output is the upper triangle of a PSD matrix: diagonal entries
    are sums of squares (non-negative) and dominate via Cauchy-Schwarz:
    gram(i,j)^2 <= gram(i,i)*gram(j,j)."""
    from p6_spark.plans import QUERIES, get_queries

    get_queries()
    rows = QUERIES["sim_gram_matrix"].build(spark, sf_dir).collect()
    g = {(r["i"], r["j"]): r["gram"] for r in rows}
    dims = sorted({i for i, _ in g})
    assert dims == list(range(1, 65))
    assert len(g) == 64 * 65 // 2
    for i in dims:
        assert g[(i, i)] >= 0
    for (i, j), v in g.items():
        if i != j:
            assert v * v <= g[(i, i)] * g[(j, j)]


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    """KMV with k=64 has relative standard error ~1/sqrt(k-2) ≈ 12.7%;
    demand the estimates land within 4 sigma of the exact counts, and
    that sub-k columns return the exact count."""
    from pyspark.sql import functions as F

    from p6_spark.plans import QUERIES, get_queries
    from p6_spark.sources.tables import load_table

    get_queries()
    est = {r["col"]: r for r in QUERIES["q_kmv_distinct"].build(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        "l_partkey": li.select("l_partkey").distinct().count(),
        "l_suppkey": li.select("l_suppkey").distinct().count(),
        "o_custkey": orders.select("o_custkey").distinct().count(),
    }
    for col, true_n in exact.items():
        r = est[col]
        if true_n <= 64:
            assert r["est_distinct"] == true_n
        else:
            assert abs(r["est_distinct"] - true_n) / true_n < 4 * 0.127


def test_countmin_overestimates_bounded(spark, sf_dir):
    """Count-min property: est >= true for every token, and with 4
    independent rows the min-of-rows overshoot stays well under the
    total stream mass / width bound (eps*N with eps = e/256)."""
    from p6_spark.operators.text import tokens as _tokens
    from p6_spark.plans import QUERIES, get_queries
    from p6_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    get_queries()
    rows = QUERIES["q_countmin_heavy"].build(spark, sf_dir).collect()
    assert len(rows) == 20
    docs = load_table(spark, sf_dir, "documents")
    n_stream = docs.select(
        F.sum(F.size(_tokens(F.col("text")))).alias("n")
    ).collect()[0]["n"]
    bound = (3 * n_stream) // 256  # e/width, rounded up generously
    for r in rows:
        assert r["est_count"] >= r["true_count"]
        assert r["est_count"] - r["true_count"] <= bound


def test_corpus_ops_survive_empty_and_null_text(spark):
    """Degenerate inputs (null text, empty string, whitespace-only,
    single token) must not crash any per-doc text operator — they are
    filtered or scored, never exceptions."""
    from p6_spark.operators.text import (
        bpe_ish_token_count,
        fingerprint,
        lang_id,
        quality_columns,
        token_count,
    )
    from p6_spark.streaming.corpus import ingest_filter
    from pyspark.sql import functions as F

    weird = spark.createDataFrame(
        [
            (1, None, "en", "s", 0),
            (2, "", "en", "s", 0),
            (3, "   \t  ", "en", "s", 6),
            (4, "one", "en", "s", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    q = quality_columns(F.col("text"))
    scored = weird.select(
        "doc_id",
        token_count(F.col("text")).alias("tc"),
        bpe_ish_token_count(F.col("text")).alias("bc"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
        *[v.alias(k) for k, v in q.items()],
    ).collect()
    assert len(scored) == 4
    by_id = {r["doc_id"]: r for r in scored}
    assert (by_id[2]["tc"], by_id[3]["tc"], by_id[4]["tc"]) == (0, 0, 1)
    # the ingest filter must reject all degenerate rows without error
    assert ingest_filter(weird).count() == 0


def test_stutter_scrub_removes_repeats(spark):
    """Known stutter cases: consecutive duplicates collapse, alternations
    survive, and clean text passes through identity (hash equals md5 of
    whitespace-normalized input)."""
    import hashlib

    from p6_spark.plans import QUERIES, get_queries

    get_queries()
    docs = spark.createDataFrame(
        [
            (0, "the the the cat", "en", "s", 15),
            (1, "a b a b a b", "en", "s", 11),
            (2, "clean text here", "en", "s", 15),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.createOrReplaceTempView("___scrub_in")
    from p6_spark.plans.llm_ops import txt_stutter_scrub
    import p6_spark.sources.tables as tables

    # run the operator body against the inline table via monkeypatched load
    orig = tables.load_table
    try:
        tables.load_table = lambda spark_, sf_, name_: docs
        import p6_spark.plans.llm_ops as llm

        orig_llm = llm.load_table
        llm.load_table = tables.load_table
        try:
            out = {r["doc_id"]: r for r in txt_stutter_scrub(spark, "ignored").collect()}
        finally:
            llm.load_table = orig_llm
    finally:
        tables.load_table = orig
    assert out[0]["n_removed"] == 2
    assert out[0]["scrubbed_md5"] == hashlib.md5(b"the cat").hexdigest()
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 0
    assert out[2]["scrubbed_md5"] == hashlib.md5(b"clean text here").hexdigest()

"""Round-9 measurement-trust family: every operator checked against an
INDEPENDENT third implementation (plain pandas/Python over the same
parquet — not the DuckDB oracle, which the sweep already replays), the
cross-engine degenerate-input guard, and the streaming ledger twin."""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from p6_spark.plans import get_queries
from p6_spark.plans.retrieval_r9 import _BOOT_B, _K, _NDCG_W, _POIS_T

SF = "/root/testdata/sf0.001"


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def _li() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


_GAIN = {"1-URGENT": 7, "2-HIGH": 3, "3-MEDIUM": 1}


def _ranked_ref() -> pd.DataFrame:
    """(q, rnk, gain) reference panel via pandas."""
    o = _orders().copy()
    o["gain"] = o["o_orderpriority"].map(_GAIN).fillna(0).astype(int)
    o = o.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    )
    o["rnk"] = o.groupby("o_custkey").cumcount() + 1
    return o.rename(columns={"o_custkey": "q"})[["q", "rnk", "gain"]]


# ---------------------------------------------------------------------------
# ml_ndcg_at_5
# ---------------------------------------------------------------------------


def test_ndcg_matches_pandas_reference(spark):
    r = _ranked_ref()
    n_queries = r["q"].nunique()
    ndcgs = []
    n_perfect = 0
    for _, g in r.groupby("q"):
        dcg = sum(
            int(row.gain) * _NDCG_W[row.rnk - 1]
            for row in g.itertuples()
            if row.rnk <= _K
        )
        ideal = g.sort_values(["gain", "rnk"], ascending=[False, True])
        idcg = sum(
            int(gain) * _NDCG_W[i]
            for i, gain in enumerate(ideal["gain"].head(_K))
        )
        if idcg > 0:
            nd = (dcg * 1_000_000) // idcg
            ndcgs.append(nd)
            n_perfect += nd == 1_000_000
    row = get_queries()["ml_ndcg_at_5"](spark, SF).first()
    assert row["n_queries"] == n_queries
    assert row["n_scored"] == len(ndcgs)
    assert row["mean_ndcg_x1e6"] == sum(ndcgs) // len(ndcgs)
    assert row["n_perfect"] == n_perfect
    # sanity: a real discount ordering means mean ndcg lives in (0, 1]
    assert 0 < row["mean_ndcg_x1e6"] <= 1_000_000


def test_ndcg_weights_are_the_literal_log2_table():
    """The embedded weights ARE round(1e9/log2(r+1)) — recomputed here
    so a typo in the literal table cannot survive."""
    import math

    assert _NDCG_W == [
        round(1e9 / math.log2(r + 1)) for r in range(1, _K + 1)
    ]


# ---------------------------------------------------------------------------
# ml_mrr_recall (+ streaming ledger twin)
# ---------------------------------------------------------------------------


def _mrr_ref():
    r = _ranked_ref()
    r = r[r["gain"] >= 3]
    stats = []
    for _, g in r.groupby("q"):
        first = int(g["rnk"].min())
        n_rel = len(g)
        rel_k = int((g["rnk"] <= _K).sum())
        stats.append((first, n_rel, rel_k))
    return stats


def test_mrr_recall_matches_pandas_reference(spark):
    stats = _mrr_ref()
    row = get_queries()["ml_mrr_recall"](spark, SF).first()
    assert row["n_queries"] == len(stats)
    assert row["mrr_x1e6"] == sum(1_000_000 // f for f, _, _ in stats) // len(stats)
    assert row["n_hit1"] == sum(1 for f, _, _ in stats if f == 1)
    assert row["n_hit3"] == sum(1 for f, _, _ in stats if f <= 3)
    assert row[f"mean_recall{_K}_x1e6"] == sum(
        (rk * 1_000_000) // nr for _, nr, rk in stats
    ) // len(stats)


def test_retrieval_ledger_stream_equals_batch(spark, tmp_path):
    """The streaming ledger on a parquet stream of the ranked panel ==
    the same function batch-side, bit for bit — and the sink +
    mrr_rollup reproduces the registry query exactly."""
    from p6_spark.plans.retrieval_r9 import _ranked_panel, mrr_rollup
    from p6_spark.streaming.evals import (
        read_ranked_stream,
        retrieval_ledger_stream,
    )
    from p6_spark.streaming.events import run_to_memory

    panel_dir = str(tmp_path / "ranked")
    batch_panel = _ranked_panel(spark, SF)
    batch_panel.write.mode("overwrite").parquet(panel_dir)

    stream = retrieval_ledger_stream(read_ranked_stream(spark, panel_dir))
    run_to_memory(stream, "retr_stream", mode="complete")
    got = sorted(
        tuple(r) for r in spark.sql("select * from retr_stream").collect()
    )
    batch = sorted(
        tuple(r)
        for r in retrieval_ledger_stream(
            spark.read.parquet(panel_dir)
        ).collect()
    )
    assert got == batch and len(got) > 0

    want = get_queries()["ml_mrr_recall"](spark, SF).first()
    sink = spark.sql(
        "select q, first_rel_rank, n_rel, rel5 from retr_stream"
    )
    rolled = mrr_rollup(sink).first()
    assert tuple(rolled) == tuple(want)


# ---------------------------------------------------------------------------
# ml_fleiss_kappa
# ---------------------------------------------------------------------------


def _tercile(q: float) -> str:
    return "low" if q < 17 else ("mid" if q < 34 else "high")


def test_fleiss_matches_python_reference(spark):
    li = _li()
    r3 = li[li["l_linenumber"] <= 3].copy()
    r3["cat"] = r3["l_quantity"].map(_tercile)
    sizes = r3.groupby("l_orderkey").size()
    items = set(sizes[sizes == 3].index)
    r3 = r3[r3["l_orderkey"].isin(items)]
    cells = r3.groupby(["l_orderkey", "cat"]).size()
    n_items = len(items)
    s2 = int((cells**2).sum())
    col = r3.groupby("cat").size()
    c2 = int((col**2).sum())
    knum = 3 * n_items * (s2 - 3 * n_items) - 2 * c2
    kden = 2 * (9 * n_items * n_items - c2)

    def tdiv(a: int, b: int) -> int:
        sign = -1 if (a < 0) != (b < 0) else 1
        return sign * (abs(a) // abs(b))

    row = get_queries()["ml_fleiss_kappa"](spark, SF).first()
    assert row["n_items"] == n_items and row["s2"] == s2 and row["c2"] == c2
    assert row["pbar_x1e6"] == ((s2 - 3 * n_items) * 1_000_000) // (6 * n_items)
    assert row["pe_x1e6"] == (c2 * 1_000_000) // (9 * n_items * n_items)
    assert row["kappa_x1e6"] == tdiv(knum * 1_000_000, kden)
    # the float kappa agrees to the truncation ulp
    pbar = (s2 - 3 * n_items) / (6 * n_items)
    pe = c2 / (9 * n_items**2)
    assert abs(row["kappa_x1e6"] / 1e6 - (pbar - pe) / (1 - pe)) < 2e-6


# ---------------------------------------------------------------------------
# ml_auc_delong
# ---------------------------------------------------------------------------


def _delong_ref():
    o = _orders()
    v = (o["o_totalprice"] * 100).round(0).astype("int64")
    y = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    df = pd.DataFrame({"v": v, "y": y})
    per = df.groupby("v")["y"].agg(["count", "sum"]).reset_index()
    per = per.rename(columns={"count": "cnt", "sum": "cnt1"}).sort_values("v")
    per["cnt0"] = per["cnt"] - per["cnt1"]
    per["neg_prior"] = per["cnt0"].cumsum() - per["cnt0"]
    per["pos_prior"] = per["cnt1"].cumsum() - per["cnt1"]
    n1, n0 = int(per["cnt1"].sum()), int(per["cnt0"].sum())
    a = 2 * per["neg_prior"] + per["cnt0"]
    b = 2 * (n1 - per["pos_prior"] - per["cnt1"]) + per["cnt1"]
    asum = int((per["cnt1"] * a).sum())
    bsum = int((per["cnt0"] * b).sum())
    ss1 = int((per["cnt1"] * a * a).sum())
    ss0 = int((per["cnt0"] * b * b).sum())
    return n1, n0, asum, bsum, ss1, ss0


def test_delong_matches_python_reference(spark):
    n1, n0, asum, bsum, ss1, ss0 = _delong_ref()
    # internal identity: positive and negative placement sums agree
    assert asum == bsum
    var10 = ((n1 * ss1 - asum * asum) // (4 * n0 * n0)) * 10**12 // (
        n1 * n1 * (n1 - 1)
    )
    var01 = ((n0 * ss0 - bsum * bsum) // (4 * n1 * n1)) * 10**12 // (
        n0 * n0 * (n0 - 1)
    )
    row = get_queries()["ml_auc_delong"](spark, SF).first()
    assert (row["n1"], row["n0"]) == (n1, n0)
    assert row["auc_x1e6"] == (asum * 1_000_000) // (2 * n1 * n0)
    assert row["var10_x1e12"] == var10
    assert row["var01_x1e12"] == var01
    assert row["var_x1e12"] == var10 + var01
    se = round((var10 + var01) ** 0.5)
    assert row["se_x1e6"] == se
    # engines truncate toward zero; Python // floors — match the spec
    znum = (row["auc_x1e6"] - 500_000) * 1_000_000
    sign = -1 if znum < 0 else 1
    assert row["z_vs_half_x1e6"] == sign * (abs(znum) // se)


def test_delong_agrees_with_float_first_principles():
    """The exact-integer spec is the DeLong estimator: recompute S10/S01
    from raw float placement values (no integer tricks) and demand the
    x1e12 integers match to rounding."""
    o = _orders()
    score = (o["o_totalprice"] * 100).round(0).astype("int64")
    y = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    pos = score[y == 1].to_numpy()
    neg = score[y == 0].to_numpy()
    n1, n0 = len(pos), len(neg)
    import numpy as np

    v10 = np.array(
        [((neg < s).sum() + 0.5 * (neg == s).sum()) / n0 for s in pos]
    )
    v01 = np.array(
        [((pos > s).sum() + 0.5 * (pos == s).sum()) / n1 for s in neg]
    )
    var = v10.var(ddof=1) / n1 + v01.var(ddof=1) / n0
    n1i, n0i, asum, bsum, ss1, ss0 = _delong_ref()
    var10 = ((n1i * ss1 - asum * asum) // (4 * n0i * n0i)) * 10**12 // (
        n1i * n1i * (n1i - 1)
    )
    var01 = ((n0i * ss0 - bsum * bsum) // (4 * n1i * n1i)) * 10**12 // (
        n0i * n0i * (n0i - 1)
    )
    # the two documented trunc steps each lose <= 1 unit of the
    # pre-division integer — at this tiny panel that is ~1e-5 relative;
    # the estimator itself is the same formula
    assert abs((var10 + var01) / 1e12 - var) / var < 1e-4
    assert abs(v10.mean() - asum / (2 * n1 * n0)) < 1e-12


def test_delong_degenerate_raises_identically(spark, tmp_path):
    """n1 <= 1 (or n0 <= 1): Spark raise_error and DuckDB error() with
    the same message — the pipe_sequence_packing discipline (a silent
    NULL on one engine only is the divergence class this repo bans)."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 100.0, "1-URGENT"),
            (2, 200.0, "5-LOW"),
            (3, 300.0, "5-LOW"),
            (4, 400.0, "5-LOW"),
        ],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "orders.parquet")
    )
    q = get_queries()["ml_auc_delong"]
    with pytest.raises(Exception, match="ml_auc_delong"):
        q(spark, sf_dir).collect()

    from p6_spark.plans.registry import QUERIES

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "orders.parquet", "*.parquet")
            )
        )
        with pytest.raises(duckdb.Error, match="ml_auc_delong"):
            con.execute(QUERIES["ml_auc_delong"].oracle).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# ml_bootstrap_ci
# ---------------------------------------------------------------------------


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _pois_weight(h: int) -> int:
    for k, t in enumerate(_POIS_T):
        if h < t:
            return k
    return 9


def test_bootstrap_matches_hashlib_reference(spark):
    o = _orders()
    y = (o["o_totalprice"] >= 250000).astype(int)
    keys = o["o_orderkey"].astype(int)
    accs = []
    for b in range(_BOOT_B):
        wsum = wy = 0
        for k, yi in zip(keys, y):
            w = _pois_weight(_md5_int(f"boot{b}_{k}"))
            wsum += w
            wy += w * yi
        accs.append((wy * 1_000_000) // max(wsum, 1))
    accs.sort()
    row = get_queries()["ml_bootstrap_ci"](spark, SF).first()
    assert row["n"] == len(o)
    assert row["point_acc_x1e6"] == (int(y.sum()) * 1_000_000) // len(o)
    assert row["boot_mean_x1e6"] == sum(accs) // _BOOT_B
    assert row["ci_lo_x1e6"] == accs[1]
    assert row["ci_hi_x1e6"] == accs[_BOOT_B - 2]
    assert row["n_replicas"] == _BOOT_B
    # the interval brackets the point estimate on any non-degenerate panel
    assert row["ci_lo_x1e6"] <= row["point_acc_x1e6"] <= row["ci_hi_x1e6"]


def test_poisson_thresholds_are_the_literal_cdf_table():
    import math

    cdf = 0.0
    want = []
    for k in range(9):
        cdf += math.exp(-1) / math.factorial(k)
        want.append(round(cdf * 2**32))
    assert _POIS_T == want
    # expected weight is ~1 (Poisson(1)): the discretized mean over the
    # full hash range stays within 0.1% of 1
    mean = sum(
        k * ((t - (0 if k == 0 else _POIS_T[k - 1])) / 2**32)
        for k, t in enumerate(_POIS_T)
    ) + 9 * (1 - _POIS_T[-1] / 2**32)
    assert abs(mean - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# dd_leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_invariants(spark):
    rows = get_queries()["dd_leakage_safe_split"](spark, SF).collect()
    by = {r["split"]: r for r in rows}
    assert set(by) <= {"train", "val"} and "train" in by
    # the headline guarantee: ZERO candidate pairs cross the split
    for r in rows:
        assert r["leaked_pairs"] == 0
    n_docs = len(_docs())
    assert sum(r["n_docs"] for r in rows) == n_docs
    # 90/10 cluster hash: train holds the bulk but not everything
    assert by["train"]["n_docs"] > n_docs // 2
    # clusters partition the corpus: every doc in exactly one cluster,
    # every cluster wholly inside one split
    assert sum(r["n_clusters"] for r in rows) <= n_docs


def test_leakage_safe_split_vs_hash_split_leaks(spark):
    """The query exists because doc-level hash splitting DOES leak:
    recompute the same candidate pairs and show a doc_id-hash split
    (dd_hash_split's unit) puts >0 pairs across the boundary, while the
    cluster split is 0 — the remediation is measurable, not cosmetic."""
    from p6_spark.operators import dedup as dd
    from p6_spark.operators.text import md5_int
    from p6_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(docs), max_bucket=20)
    doc_split = docs.select(
        "doc_id",
        (md5_int(F.concat(F.lit("split_"), F.col("doc_id").cast("string"))) % 10 < 9)
        .alias("is_train"),
    )
    leaked = (
        pairs.join(
            doc_split.select(F.col("doc_id").alias("id_a"), F.col("is_train").alias("ta")),
            "id_a",
        )
        .join(
            doc_split.select(F.col("doc_id").alias("id_b"), F.col("is_train").alias("tb")),
            "id_b",
        )
        .filter(F.col("ta") != F.col("tb"))
        .count()
    )
    assert leaked > 0  # naive doc-hash split leaks near-dup pairs


# ---------------------------------------------------------------------------
# pipe_percentile_prune
# ---------------------------------------------------------------------------


def test_percentile_prune_matches_pandas_reference(spark):
    docs = _docs()
    toks = docs["text"].str.strip().str.split(r"\s+")
    qs = pd.Series(
        [
            (len(set(t)) * 1_000_000) // len(t)
            for t in toks
        ],
        index=docs.index,
    )
    n_tok = toks.map(len)
    got = {
        r["lang"]: r
        for r in get_queries()["pipe_percentile_prune"](spark, SF).collect()
    }
    for lang, idx in docs.groupby("lang").groups.items():
        sub = pd.DataFrame({"qs": qs[idx], "tok": n_tok[idx]})
        per = (
            sub.groupby("qs")
            .agg(cnt=("qs", "size"), tok=("tok", "sum"))
            .sort_index()
        )
        cum = per["cnt"].cumsum()
        nd = int(per["cnt"].sum())
        budget = nd // 4
        fits = cum[cum <= budget]
        thr = int(fits.index.max()) if len(fits) else -1
        n_dropped = int(fits.max()) if len(fits) else 0
        tok_dropped = (
            int(per.loc[per.index <= thr, "tok"].sum()) if len(fits) else 0
        )
        r = got[lang]
        assert r["n_docs"] == nd
        assert r["threshold_x1e6"] == thr
        assert r["n_dropped"] == n_dropped
        assert r["n_kept"] == nd - n_dropped
        assert r["tok_dropped"] == tok_dropped
        # the budget is a hard ceiling and tie-groups are atomic
        assert n_dropped <= budget


def test_percentile_prune_tie_groups_are_atomic(spark):
    """Every lang's n_dropped is an exact tie-group boundary: dropping
    one more tie-group would exceed floor(N/4)."""
    rows = get_queries()["pipe_percentile_prune"](spark, SF).collect()
    for r in rows:
        assert r["n_dropped"] <= r["n_docs"] // 4
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]

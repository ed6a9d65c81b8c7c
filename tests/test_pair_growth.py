"""Empirical quadratic-growth gate over every candidate-PAIR-producing
family (VERDICT r5 item 2): the plan-sweep gate catches single-partition
windows and cartesian products, but a self-join on a FIXED-cardinality
blocking key passes it while its pair count grows quadratically with the
data — the class dd_embedding_neardup/ml_dbscan_core fell into in
round 5. This gate measures the actual internal candidate-pair count of
each family across the sf0.001 -> sf0.1 decade and fails on
super-linear growth.

Covenant: every NEW query family that self-joins (or windows into
pairs) must add an entry to FAMILIES below, reproducing its candidate
stage. The assertion is

    pairs_big <= max(pairs_small, MIN_BASE) * rows_ratio * SLACK

i.e. pair volume may grow at most linearly in the input (2x slack for
hash-distribution drift; MIN_BASE keeps tiny-count ratios from being
noise). The round-5 label-blocked design fails this gate (proven by
test_gate_catches_fixed_label_quadratic below: 4x rows -> ~16x pairs);
the adaptive capped-LSH rewrite passes it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p6_spark.sources.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.1"
SLACK = 2.0
MIN_BASE = 30


def _minhash_pairs(spark, sf_dir):
    from p6_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    return dd.lsh_candidate_pairs(dd.minhash_signatures(docs), max_bucket=20)


def _simhash_pairs(spark, sf_dir):
    # mirrors the candidate stage of plans/frontier_ops.dd_simhash_pairs
    from p6_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    sig = dd.simhash62_table(docs).withColumnRenamed("simhash", "s")
    blocked = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("blk_idx"),
                    F.expr("s div 2147483648").alias("blk_val"),
                ),
                F.struct(
                    F.lit(1).alias("blk_idx"),
                    (F.col("s") % F.lit(2147483648).cast("long")).alias("blk_val"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.blk_idx").alias("blk_idx"), F.col("b.blk_val").alias("blk_val"))
    small = (
        blocked.groupBy("blk_idx", "blk_val")
        .agg(F.count(F.lit(1)).alias("blk_n"))
        .filter(F.col("blk_n") <= 20)
        .select("blk_idx", "blk_val")
    )
    blocked = blocked.join(small, ["blk_idx", "blk_val"])
    return (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def _embedding_lsh_pairs(spark, sf_dir):
    from p6_spark.operators.similarity import lsh_candidate_vec_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_candidate_vec_pairs(emb)


def _incremental_probe_pairs(spark, sf_dir):
    # mirrors the candidate stage of plans/incremental_r6.dd_incremental_neardup:
    # batch bands PROBE the capped corpus-band index (no self-join at all)
    from p6_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 4 == 0
    sigs = dd.minhash_signatures(docs)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    F.col(f"h{2 * b}").cast("string"),
                    F.col(f"h{2 * b + 1}").cast("string"),
                ).alias("band_val"),
            )
            for b in range(4)
        ]
    )
    banded = sigs.select(
        "doc_id", is_batch.alias("is_batch"), F.explode(bands).alias("band")
    ).select("doc_id", "is_batch", "band.band_idx", "band.band_val")
    corpus_small = (
        banded.filter(~F.col("is_batch"))
        .groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= 20)
        .select("band_idx", "band_val")
    )
    corpus_b = banded.filter(~F.col("is_batch")).join(
        corpus_small, ["band_idx", "band_val"]
    )
    return (
        banded.filter(F.col("is_batch"))
        .select("band_idx", "band_val", F.col("doc_id").alias("b_id"))
        .join(
            corpus_b.select("band_idx", "band_val", F.col("doc_id").alias("c_id")),
            ["band_idx", "band_val"],
        )
        .select("b_id", "c_id")
        .distinct()
    )


def _market_basket_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    return items.alias("a").join(
        items.alias("b"),
        (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
    )


def _sorted_neighborhood_pairs(spark, sf_dir):
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "n_chars", F.expr("n_chars div 16").alias("blk")
    )
    w = W.partitionBy("blk").orderBy("n_chars", "doc_id")
    neigh = toks.select(
        "doc_id", *[F.lead("doc_id", off).over(w).alias(f"d{off}") for off in (1, 2, 3)]
    )
    frames = [
        neigh.filter(F.col(f"d{off}").isNotNull()).select("doc_id", F.col(f"d{off}"))
        for off in (1, 2, 3)
    ]
    return frames[0].unionByName(frames[1], allowMissingColumns=True).unionByName(
        frames[2], allowMissingColumns=True
    )


# family -> (input table, candidate-pair builder). Each builder
# reproduces the candidate stage of the like-named registry quer(ies);
# dd_ngram_jaccard / dd_lsh_tuning / q_graph_* run on FIXED id panels
# (doc_id < 120 / < 1000) and are growth-bounded by construction.
FAMILIES = {
    "minhash_lsh[dd_minhash_lsh_pairs,pipe_llm_corpus]": ("documents", _minhash_pairs),
    "simhash_blocks[dd_simhash_pairs]": ("documents", _simhash_pairs),
    "embedding_lsh[dd_embedding_neardup,ml_dbscan_core,ml_dbscan_clusters]": (
        "embeddings",
        _embedding_lsh_pairs,
    ),
    "incremental_probe[dd_incremental_neardup]": (
        "documents",
        _incremental_probe_pairs,
    ),
    "market_basket[q_market_basket]": ("lineitem", _market_basket_pairs),
    "sorted_neighborhood[er_sorted_neighborhood]": (
        "documents",
        _sorted_neighborhood_pairs,
    ),
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_pair_growth_is_at_most_linear(spark, family):
    table, builder = FAMILIES[family]
    n_small = load_table(spark, SF_SMALL, table).count()
    n_big = load_table(spark, SF_BIG, table).count()
    p_small = builder(spark, SF_SMALL).count()
    p_big = builder(spark, SF_BIG).count()
    rows_ratio = n_big / n_small
    bound = max(p_small, MIN_BASE) * rows_ratio * SLACK
    assert p_big <= bound, (
        f"{family}: candidate pairs grew {p_small} -> {p_big} while input "
        f"rows grew {n_small} -> {n_big} ({rows_ratio:.1f}x); bound was "
        f"{bound:.0f}. Super-linear pair growth = a quadratic block "
        "self-join — block on a key whose cardinality scales with the "
        "data (adaptive LSH buckets, operators/similarity."
        "lsh_candidate_vec_pairs) and cap bucket membership."
    )


def test_gate_catches_fixed_label_quadratic(spark):
    """Self-check: the round-5 design (self-join blocked on the
    fixed-cardinality label column) must FAIL the linear-growth bound —
    proving this gate would have caught the scale-killer the plan-sweep
    gate missed."""

    def label_block_pairs(sf_dir):
        e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
        return (
            e.alias("a")
            .join(
                e.alias("b"),
                (F.col("a.label") == F.col("b.label"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .count()
        )

    n_small = load_table(spark, SF_SMALL, "embeddings").count()
    n_big = load_table(spark, SF_BIG, "embeddings").count()
    p_small, p_big = label_block_pairs(SF_SMALL), label_block_pairs(SF_BIG)
    bound = max(p_small, MIN_BASE) * (n_big / n_small) * SLACK
    assert p_big > bound, (
        "expected the fixed-label quadratic to exceed the linear bound; "
        "if the data changed shape, recalibrate MIN_BASE/SLACK"
    )

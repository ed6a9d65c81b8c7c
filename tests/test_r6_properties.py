"""Property tests for the round-6 family, beyond oracle equality:
IVFPQ's compressed-domain ranking must stay close to the exact re-rank
it approximates, and dd_split_leakage's repair rule must actually
eliminate leakage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.plans.registry import QUERIES, get_queries
from p6_spark.sources.tables import load_table

get_queries()


def test_ivfpq_recall_vs_exact_rerank(spark, sf_dir):
    # Same coarse probes, two rankers: sim_ivf_ann re-ranks the probed
    # lists with EXACT integer L2; sim_ivfpq_search ranks the same
    # candidates from 8 sign-grid codes. The 32x-compressed ranking must
    # still recover a meaningful share of the exact top-5 (sign-grid
    # codes are coarse, so the bar is recall >= 0.2 overall and every
    # query shares at least part of its candidate pool).
    exact = QUERIES["sim_ivf_ann"].build(spark, sf_dir).collect()
    adc = QUERIES["sim_ivfpq_search"].build(spark, sf_dir).collect()
    want = {(r["query_id"], r["match_id"]) for r in exact}
    got = {(r["query_id"], r["match_id"]) for r in adc}
    assert len(want) > 0 and len(got) > 0
    recall = len(want & got) / len(want)
    assert recall >= 0.2, f"ADC recall vs exact re-rank collapsed: {recall}"


def test_split_leakage_repair_eliminates_leaks(spark, sf_dir):
    # Recompute cluster/split membership exactly as dd_split_leakage
    # does, apply the repair (every member takes its component
    # representative's split), and assert zero straddling clusters
    # remain — the invariant that makes n_moved_by_repair a complete
    # fix, not a heuristic.
    from p6_spark.operators import dedup as dd
    from p6_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(docs), max_bucket=20)
    cc = connected_components(pairs)

    def split_of(col):
        b = (col * F.lit(2654435761)) % F.lit(4294967296) % F.lit(100)
        return F.when(b < 90, "train").when(b < 95, "validation").otherwise("test")

    repaired = cc.select("component", split_of(F.col("component")).alias("split"))
    still_leaky = (
        repaired.groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert still_leaky == 0

    # and the report's arithmetic invariants hold
    row = QUERIES["dd_split_leakage"].build(spark, sf_dir).collect()[0]
    assert row["n_leaky_clusters"] <= row["n_clusters"]
    assert row["n_moved_by_repair"] <= row["n_docs_in_leaky"] or row[
        "n_docs_in_leaky"
    ] == 0

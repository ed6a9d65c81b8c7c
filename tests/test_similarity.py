"""Similarity-search tests: brute-force is the exact baseline; LSH ANN
must (a) only return true-cosine-ranked rows within buckets and (b)
achieve reasonable recall of the exact top-k on this corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.operators.similarity import brute_force_topk, lsh_ann_topk
from p6_spark.sources.tables import load_table


def test_bruteforce_topk_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries, k=5).collect()
    assert len(out) == 15
    for q in range(3):
        sims = [r["cos_sim"] for r in out if r["query_id"] == q]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    ann = lsh_ann_topk(emb, queries, k=5, num_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["match_id"])
    hit = total = 0
    for r in ann:
        total += 1
        if r["match_id"] in exact_sets.get(r["query_id"], set()):
            hit += 1
    # 4 planes => 1/16 of the corpus per bucket on average; matched
    # neighbors are exact-ranked within the bucket. Demand nonzero recall
    # and a sane precision floor — this is a smoke bound, not a tuning test.
    assert total > 0
    assert hit / total > 0.2


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    from p6_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    ann = ivf_topk(emb, queries, k=5, num_centroids=8, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["match_id"])
    hit = total = 0
    for r in ann:
        total += 1
        if r["match_id"] in exact_sets.get(r["query_id"], set()):
            hit += 1
    assert total > 0
    # probing 3/8 lists must recover a solid share of the true top-5
    assert hit / total > 0.4


def test_ivf_training_is_deterministic(spark, sf_dir):
    from p6_spark.operators.ivf import train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    m1 = train_centroids(emb, k=4, iters=2)
    m2 = train_centroids(emb, k=4, iters=2)
    assert m1 == m2


def test_dedup_exact_keeps_min_id(spark):
    from p6_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in dedup_exact(df).collect())
    assert kept == [1, 2]

"""Planted-NEIGHBORHOOD recall gate for the mutual-kNN graph (VERDICT
r8 item 2): top-k neighborhood recall is a STRICTER property than the
candidate-pair recall `tests/test_lsh_recall.py` floors — a true top-k
neighbor missing from the candidate set is invisible to the pair gate
(the pair was never planted as an exact duplicate), and BENCH_NOTES
honestly concedes the knn decade measurement is size-capped and not
scale evidence. This gate is that evidence: plant known nearest-
neighbor CLUSTERS in a corpus above the old 16-plane cliff (~1.3M
vectors), run the REAL sim_knn_graph core (_mutual_knn_edges), and
assert mutual-EDGE recall over the planted clusters.

Cluster design: 100 clusters of 6 IDENTICAL vectors dropped into 2M
hash-derived background vectors. Within a cluster every member's true
top-5 (k = _KNN_K = 5) is exactly the other 5 members (cosine 1.0,
strictly above any non-parallel background vector), so the full mutual
graph over a cluster is K_6 = 15 edges — 1500 planted edges total with
zero ambiguity about the ground truth. Losses can come only from the
LSH candidate stage (bucket cap / signature width), so a recall
collapse here means the blocking stopped delivering true neighborhoods
at exactly the corpus sizes the graph exists for.

Self-check: the pre-round-7 16-plane clamp must FAIL the same floor on
the same corpus — proving the gate is red under the narrowed signature
(the VERDICT's 'done' bar) and green at 48 planes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_BG_N = 2_000_000  # background corpus, above the old ~1.3M 16-plane cliff
_DIM = 16
_N_CLUSTERS = 100
_CLUSTER = 6  # members per cluster -> C(6,2) = 15 mutual edges each
_OFF = 10_000_000  # planted ids live far above background ids
_TRUE_EDGES = _N_CLUSTERS * (_CLUSTER * (_CLUSTER - 1) // 2)


def _planted_cluster_corpus(spark):
    """2M deterministic background vectors + 100 six-member clusters of
    identical vectors (cluster c occupies ids _OFF + 6c .. _OFF + 6c+5,
    sharing the hash-derived vector seeded by c). Components are
    hash-derived doubles centered on 0 so hyperplane sign bits are
    balanced; localCheckpoint so the healthy and the clamped run reuse
    one materialization."""

    def vec(seed):
        return F.expr(
            f"transform(sequence(0, {_DIM - 1}), "
            f"j -> cast(pmod(hash({seed} * {_DIM} + j), 1000) as double)"
            " / 1000.0 - 0.5)"
        )

    base = spark.range(_BG_N).select(
        F.col("id").alias("vec_id"), vec("id").alias("embedding")
    )
    planted = spark.range(_N_CLUSTERS * _CLUSTER).select(
        (F.col("id") + _OFF).alias("vec_id"),
        # seed by the CLUSTER index (shifted past background seeds), so
        # all 6 members share one vector distinct from every background
        vec(f"(cast(id as bigint) div {_CLUSTER} + {_BG_N + 7})").alias(
            "embedding"
        ),
    )
    return base.unionByName(planted).localCheckpoint()


def _planted_edge_hits(edges) -> int:
    """Mutual edges with BOTH endpoints inside one planted cluster."""
    return edges.filter(
        (F.col("id_a") >= _OFF)
        & (F.col("id_b") >= _OFF)
        & F.expr(f"(id_a - {_OFF}) div {_CLUSTER} = (id_b - {_OFF}) div {_CLUSTER}")
    ).count()


def test_mutual_knn_edge_recall_at_2m(spark):
    """The production design (48-plane ceiling, 4 OR-amplified tables)
    must recover >= 0.8 of the 1500 planted mutual-kNN edges at 2M+
    vectors. Identical cluster members share every signature, so the
    only legitimate loss is the 20-member bucket cap on this
    deliberately low-dim corpus."""
    corpus = _planted_cluster_corpus(spark)
    try:
        from p6_spark.plans.curation_r8 import _mutual_knn_edges

        hits = _planted_edge_hits(_mutual_knn_edges(corpus))
        assert hits >= 0.8 * _TRUE_EDGES, (
            f"mutual-kNN edge recall collapsed at n={_BG_N}: "
            f"{hits}/{_TRUE_EDGES} planted cluster edges recovered. "
            "Cluster members share every signature, so this means the "
            "candidate stage stopped delivering true NEIGHBORHOODS — "
            "the defect class the pair gate cannot see."
        )
    finally:
        corpus.unpersist()


def test_mutual_knn_16_plane_clamp_fails_at_2m(spark):
    """Self-check: the pre-round-7 16-plane clamp must FAIL the edge
    floor on the same corpus — at n=2M every 16-bit bucket holds ~30
    rows, the 20-member cap drops essentially all of them, and the
    planted neighborhoods never become candidates. Proves this gate is
    red under a deliberately narrowed signature (the VERDICT 'done'
    bar). 2 tables: fewer tables can only make the clamped design look
    worse, never better, and halves the runtime."""
    corpus = _planted_cluster_corpus(spark)
    try:
        from p6_spark.plans.curation_r8 import _mutual_knn_edges

        hits = _planted_edge_hits(
            _mutual_knn_edges(corpus, num_tables=2, max_planes=16)
        )
        assert hits < 0.5 * _TRUE_EDGES, (
            "expected the 16-plane clamp to lose most planted edges at "
            f"n={_BG_N} (got {hits}/{_TRUE_EDGES}); if this passes, the "
            "corpus no longer reproduces the cliff — recalibrate"
        )
    finally:
        corpus.unpersist()

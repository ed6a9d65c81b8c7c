"""Round-8 curation-family property gates — the invariants that make
each operator trustworthy, checked on real harness data (sf0.001):

- serpentine sharding: byte imbalance bounded by ONE document's size;
- curriculum epoch 0: tier position ranges tile 1..N contiguously;
- threshold sweep: pairs/docs monotone non-increasing in threshold;
- mutual-kNN: degree never exceeds k (mutuality can only prune);
- cross-shard audit: scopes partition the confirmed pair set;
- post-dedup mixture: survivors never gain chars, totals never grow.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.plans import get_queries
from p6_spark.sources.tables import load_table


def test_serpentine_imbalance_bounded_by_one_doc(spark, sf_dir):
    rows = get_queries()["pipe_shard_balance"](spark, sf_dir).collect()
    assert len(rows) == 16
    totals = [r["total_chars"] for r in rows]
    max_doc = load_table(spark, sf_dir, "documents").agg(
        F.max("n_chars")
    ).first()[0]
    # serpentine LPT: each deal pass adds one doc to every shard, and
    # within a pass any two shards' docs differ by at most the pass's
    # size spread <= the largest doc overall
    assert max(totals) - min(totals) <= max_doc
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_curriculum_epoch0_tiers_tile_contiguously(spark, sf_dir):
    rows = get_queries()["pipe_curriculum_order"](spark, sf_dir).collect()
    e0 = sorted(
        (r["tier"], r["first_pos"], r["last_pos"], r["n_docs"])
        for r in rows
        if r["epoch"] == 0
    )
    expect_start = 1
    for tier, first, last, n in e0:
        assert first == expect_start, (tier, first, expect_start)
        assert last - first + 1 == n
        expect_start = last + 1
    total = sum(n for *_rest, n in e0)
    assert expect_start == total + 1
    # later epochs interleave: some tier's range must OVERLAP another's
    for ep in (1, 2):
        spans = [
            (r["first_pos"], r["last_pos"]) for r in rows if r["epoch"] == ep
        ]
        spans.sort()
        assert any(
            spans[i][1] >= spans[i + 1][0] for i in range(len(spans) - 1)
        ), f"epoch {ep} unexpectedly tier-sorted"


def test_threshold_sweep_monotone(spark, sf_dir):
    rows = get_queries()["dd_threshold_sweep"](spark, sf_dir).collect()
    assert [r["thr_x1e6"] for r in rows] == sorted(r["thr_x1e6"] for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_docs_affected"] >= b["n_docs_affected"]


def test_knn_degree_bounded_by_k(spark, sf_dir):
    rows = get_queries()["sim_knn_graph"](spark, sf_dir).collect()
    assert rows, "mutual graph unexpectedly empty"
    assert all(1 <= r["degree"] <= 5 for r in rows)


def test_cross_shard_scopes_partition_confirmed_pairs(spark, sf_dir):
    from p6_spark.plans.curation_r8 import _DUP_CUT, _jaccard_scored

    audit = {
        r["scope"]: r["n_pairs"]
        for r in get_queries()["dd_cross_shard_dup_audit"](
            spark, sf_dir
        ).collect()
    }
    confirmed = (
        _jaccard_scored(spark, sf_dir)
        .filter(F.col("jaccard_x1e6") >= _DUP_CUT)
        .count()
    )
    assert sum(audit.values()) == confirmed > 0


def test_post_dedup_mixture_shrinks(spark, sf_dir):
    rows = get_queries()["pipe_post_dedup_mixture"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["avail_after"] <= r["avail_before"]
        assert r["total_after"] <= r["total_before"]
    # totals replay the water-filling min exactly
    tb = min(
        (r["avail_before"] * 1_000_000) // r["w_x1e6"] for r in rows
    )
    assert rows[0]["total_before"] == tb

"""Round-9 session-2 hardening: named loud-failure guards on the
remaining division edges (empty documents in the two quality-score
queries; zero-truncated propensity mass in SNIPS) — ANSI mode already
raises on div-by-zero in BOTH engines, so these guards upgrade a bare
DIVIDE_BY_ZERO into a named, self-diagnosing error that is IDENTICAL
across engines — plus the streaming conformal-coverage monitor's
stream-equals-batch pin."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _write_docs_with_empty(spark, path: str) -> None:
    spark.createDataFrame(
        [
            (0, "a normal document with words", "en", "web", 28),
            (1, "   ", "en", "web", 3),  # whitespace-only -> zero tokens
            (2, "another fine document", "en", "web", 21),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


@pytest.mark.parametrize(
    "name", ["pipe_quality_budget_cut", "pipe_percentile_prune"]
)
def test_empty_document_raises_identically(spark, tmp_path, name):
    sf_dir = str(tmp_path)
    _write_docs_with_empty(spark, sf_dir)
    with pytest.raises(Exception, match=name):
        get_queries()[name](spark, sf_dir).collect()

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "documents.parquet", "*.parquet")
            )
        )
        with pytest.raises(duckdb.Error, match=name):
            con.execute(QUERIES[name].oracle).fetchall()
    finally:
        con.close()


@pytest.mark.parametrize(
    "name", ["pipe_quality_budget_cut", "pipe_percentile_prune"]
)
def test_quality_queries_unchanged_on_clean_corpus(spark, name):
    """The guard must be invisible on non-degenerate data: the query
    still runs green on the harness corpus (the oracle sweep separately
    pins exact values)."""
    df = get_queries()[name](spark, SF)
    assert df.count() > 0


def test_snips_denominator_cannot_be_zero():
    """Why ml_ips_offpolicy carries NO sum_w guard: sum_w = 0 is
    mathematically unreachable. At least one cell in every context has
    n_xa <= n_x / n_actions (the minimum-mass cell), so its weight
    n_x * 1e6 // (n_actions * n_xa) is >= 1e6 before truncation — a
    guard would be dead code. Brute-forced here over random panels,
    including degenerate shapes (one action, all-singletons, heavy
    concentration in wide action spaces) where individual cells DO
    truncate to zero."""
    import random

    rng = random.Random(7)
    # the > 1e6-action worst case, closed form: every singleton cell's
    # weight is n_x * 1e6 // n_actions >= 1e6 because n_x >= n_actions
    n_actions, n_x = 2_000_000, 2_000_000 + 10**9
    assert (n_x * 1_000_000) // (n_actions * 1) >= 1_000_000
    for trial in range(300):
        n_actions = rng.choice([1, 2, 5, 100, 10_000])
        # action counts: one dominant cell + singletons (worst case for
        # truncation), or uniform
        if rng.random() < 0.5 and n_actions > 1:
            counts = [rng.randint(1, 5) for _ in range(n_actions - 1)]
            counts.append(rng.randint(1, 10**9))  # concentrated cell
        else:
            counts = [rng.randint(1, 100) for _ in range(min(n_actions, 50))]
        n_x = sum(counts)
        weights = [
            (n_x * 1_000_000) // (len(counts) * n_xa) for n_xa in counts
        ]
        assert sum(weights) >= 1_000_000, (trial, len(counts))
        # and the minimum-mass cell specifically carries >= 1e6
        assert max(weights) >= 1_000_000


# ---------------------------------------------------------------------------
# streaming conformal coverage monitor
# ---------------------------------------------------------------------------


def test_coverage_monitor_stream_equals_batch_query(spark, tmp_path):
    """Static thresholds from the batch query + the holdout score
    stream reproduce ml_conformal_threshold's coverage rows exactly —
    calibrate once batch-side, monitor forever stream-side."""
    from p6_spark.sources.tables import load_table
    from p6_spark.streaming.evals import (
        coverage_monitor_stream,
        read_scores_stream,
    )
    from p6_spark.streaming.events import run_to_memory

    want = get_queries()["ml_conformal_threshold"](spark, SF).collect()
    thresholds = spark.createDataFrame(
        [(r["alpha_x100"], r["n_cal"], r["k"], r["threshold"]) for r in want],
        "alpha_x100 int, n_cal long, k long, threshold long",
    )
    # materialize the SAME holdout split the batch query scores
    li = load_table(spark, SF, "lineitem")
    holdout = li.filter(F.col("l_orderkey") % 2 != 0).select(
        F.expr(
            "abs(cast(round(l_extendedprice * 100, 0) as bigint)"
            " - cast(l_quantity as bigint) * 100000)"
        ).alias("score")
    )
    score_dir = str(tmp_path / "scores")
    holdout.write.mode("overwrite").parquet(score_dir)

    stream = coverage_monitor_stream(
        read_scores_stream(spark, score_dir), thresholds
    )
    run_to_memory(stream, "cov_stream", mode="complete")
    got = {
        r["alpha_x100"]: r for r in spark.sql("select * from cov_stream").collect()
    }
    assert len(got) == len(want)
    for w in want:
        g = got[w["alpha_x100"]]
        assert (g["n_cal"], g["k"], g["threshold"]) == (
            w["n_cal"],
            w["k"],
            w["threshold"],
        )
        assert (g["n_holdout"], g["coverage_x1e6"], g["target_x1e6"]) == (
            w["n_holdout"],
            w["coverage_x1e6"],
            w["target_x1e6"],
        )

"""Streaming pass@k / calibration must equal their batch twins — same
per-key ledgers, same exact x1e6 integers — and roll up to the registry
queries' cross-group outputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.sources.tables import load_table
from p6_spark.streaming.evals import (
    calibration_bins_stream,
    ece_from_bins,
    pass_at_k_stream,
    read_outcomes_stream,
    read_scored_stream,
)
from p6_spark.streaming.events import run_to_memory


def _rows(collected):
    return sorted(tuple(r) for r in collected)


def test_pass_at_k_stream_equals_batch(spark, sf_dir):
    stream = pass_at_k_stream(read_outcomes_stream(spark, sf_dir))
    run_to_memory(stream, "passk_stream", mode="complete")
    got = spark.sql("select * from passk_stream").collect()

    batch = pass_at_k_stream(
        load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    ).collect()
    assert _rows(got) == _rows(batch)
    assert len(got) > 0


def test_pass_at_k_stream_rolls_up_to_registry_query(spark, sf_dir):
    """mean over the streamed per-task pass@k == ml_pass_at_k's
    mean_pass_x1e6 for every k — the stream sink is a faithful input to
    the batch report."""
    from p6_spark.plans import get_queries

    stream = pass_at_k_stream(read_outcomes_stream(spark, sf_dir))
    run_to_memory(stream, "passk_rollup", mode="complete")
    want = {
        r["k"]: (r["n_tasks"], r["mean_pass_x1e6"])
        for r in get_queries()["ml_pass_at_k"](spark, sf_dir).collect()
    }
    for k, (n_tasks, mean) in want.items():
        got = (
            spark.sql("select * from passk_rollup")
            .filter(F.col(f"pass{k}_x1e6").isNotNull())
            .agg(
                F.count(F.lit(1)).alias("n_tasks"),
                F.expr(f"sum(pass{k}_x1e6) div count(*)").alias("mean"),
            )
            .first()
        )
        assert (got["n_tasks"], got["mean"]) == (n_tasks, mean), k


def test_calibration_stream_equals_batch(spark, sf_dir):
    """Streaming reliability ledger == the same builder run batch-side:
    identical per-bin integers, bit for bit (VERDICT r8 item 3)."""
    stream = calibration_bins_stream(read_scored_stream(spark, sf_dir))
    run_to_memory(stream, "cal_stream", mode="complete")
    got = spark.sql("select * from cal_stream").collect()

    batch = calibration_bins_stream(
        load_table(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_extendedprice"
        )
    ).collect()
    assert _rows(got) == _rows(batch)
    assert len(got) > 0


def test_calibration_stream_rolls_up_to_registry_query(spark, sf_dir):
    """Sink + ece_from_bins reproduces ml_calibration_bins exactly —
    every per-bin row AND the cross-bin ECE scalar."""
    from p6_spark.plans import get_queries

    stream = calibration_bins_stream(read_scored_stream(spark, sf_dir))
    run_to_memory(stream, "cal_rollup", mode="complete")
    sink = spark.sql("select * from cal_rollup")

    want_rows = get_queries()["ml_calibration_bins"](spark, sf_dir).collect()
    want = {
        r["bin"]: (r["n"], r["mean_conf_x1e6"], r["acc_x1e6"], r["gap_x1e6"])
        for r in want_rows
    }
    got = {
        r["bin"]: (r["n"], r["mean_conf_x1e6"], r["acc_x1e6"], r["gap_x1e6"])
        for r in sink.collect()
    }
    assert got == want
    ece = ece_from_bins(sink).first()["ece_x1e6"]
    assert all(r["ece_x1e6"] == ece for r in want_rows)

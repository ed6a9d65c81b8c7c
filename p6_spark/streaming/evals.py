"""Structured Streaming eval telemetry — the incremental spelling of
ml_pass_at_k (plans/eval_r8.py): sample outcomes arrive as a stream,
per-task (n, c) accumulate in ONE stateful aggregation, and the exact
pass@k integers are a stateless projection on top.

Why this shape: Structured Streaming allows a single stateful
aggregation per query, so the cross-task mean that the batch query
reports is NOT computed stream-side — it is a trivial rollup of the
per-task sink (any consumer can run it per refresh); the part that
needs streaming state is exactly the per-task (n, c) ledger, and that
is the one aggregation here. The pass@k columns reuse the identical
staged-decimal expression the batch query certifies against DuckDB
(_pass_sql), so stream and batch produce bit-identical integers —
pinned by tests/test_streaming_evals.py.

At scale: the state is |tasks| rows of two longs (an eval suite has
thousands of tasks, not billions) — state size is bounded by the task
universe, independent of how many sample outcomes stream through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from p6_spark.plans.eval_r8 import _N_TASKS, _PASS_KS, _pass_sql

OUTCOMES_SCHEMA = T.StructType(
    [
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
    ]
)


def read_outcomes_stream(spark, sf_dir: str) -> DataFrame:
    """Sample-outcome stream from the lineitem files (task = partkey
    bucket, success = quantity threshold — the same synthetic eval
    panel as ml_pass_at_k). Parquet column pruning applies: only the
    two declared columns are read."""
    return (
        spark.readStream.schema(OUTCOMES_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "lineitem.parquet")
        .load(sf_dir)
    )


def pass_at_k_stream(outcomes: DataFrame) -> DataFrame:
    """Per-task running pass@k: ONE streaming aggregation to (task_id,
    n, c), then the exact x1e6 pass@k columns for every k in _PASS_KS
    as a stateless projection (NULL while n < k — the estimator is
    undefined until a task has k samples). Works identically on a batch
    DataFrame (the parity test runs this very function on one)."""
    per_task = (
        outcomes.select(
            (F.col("l_partkey") % _N_TASKS).alias("task_id"),
            F.when(F.col("l_quantity") >= 25, 1).otherwise(0).alias("ok"),
        )
        .groupBy("task_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ok").cast("long").alias("c"))
    )
    cols = [
        F.when(
            F.col("n") >= k, F.expr(_pass_sql(k, "spark"))
        ).alias(f"pass{k}_x1e6")
        for k in _PASS_KS
    ]
    return per_task.select("task_id", "n", "c", *cols)

"""Incremental aggregation / materialized-view maintenance.

The 100 TB pattern: never re-scan history. Facts are aggregated once
into fine-grained PARTIAL aggregates (per day here), persisted
partitioned by the grain; coarser results (per month, per year, total)
re-aggregate the partials. This works exactly when every measure is
MERGEABLE:

- count/sum: mergeable by sum (kept exact here — cent-scaled bigints);
- distinct count: NOT mergeable exactly, so the partial carries an HLL
  sketch (hll_sketch_agg) — register-wise max union is lossless for the
  sketch, so merging day sketches gives the identical estimate a global
  sketch would (tests/test_incremental.py asserts equality);
- min/max/bit_xor: mergeable as themselves.

A new day of data therefore costs one day's scan + one partition write,
and every rollup over any date range reads only the partial rows —
that is the difference between a dashboard refresh touching 100 GB and
one touching 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def daily_order_partials(orders: DataFrame) -> DataFrame:
    """One row per (orderdate-day, orderpriority): exact mergeable sums
    plus an HLL sketch of distinct customers."""
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("day"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
            F.hll_sketch_agg("o_custkey").alias("cust_sketch"),
        )
    )


def write_partials(partials: DataFrame, path: str) -> None:
    """Persist the partial-aggregate table partitioned by day — an
    incremental refresh overwrites only the day partitions that changed
    (dynamic partition overwrite on a real deployment)."""
    partials.write.mode("overwrite").partitionBy("day").parquet(path)


def monthly_from_partials(spark: SparkSession, path: str) -> DataFrame:
    """Roll the persisted daily partials up to months: sums add, HLL
    sketches union — no fact-table access."""
    p = spark.read.parquet(path)
    return (
        p.groupBy(
            F.substring("day", 1, 7).alias("month"),
            "o_orderpriority",
        )
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("cents").alias("cents"),
            F.hll_sketch_estimate(F.hll_union_agg("cust_sketch")).alias("approx_cust"),
        )
        .orderBy("month", "o_orderpriority")
    )


def monthly_direct(orders: DataFrame) -> DataFrame:
    """The same monthly rollup computed straight from the fact table —
    the correctness oracle for the incremental path."""
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("approx_cust"),
        )
        .orderBy("month", "o_orderpriority")
    )

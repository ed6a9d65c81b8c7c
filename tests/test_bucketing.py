"""Bucketed-table co-located join: the physical-layout capability the
100 TB story leans on. Both sides of a fact-fact join written with
bucketBy on the join key; the subsequent SortMergeJoin must read the
buckets directly — NO Exchange (shuffle) on either side — and the
result must equal the plain-parquet join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p6_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_join(spark, sf_dir, tmp_path_factory):
    # explicit per-table paths; the (static) warehouse dir is never touched
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(name)
        )
    yield spark
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _joined(spark):
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    return (
        bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


def test_bucketed_join_has_no_exchange(bucketed_join):
    spark = bucketed_join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what kills the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = _joined(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # the bucketed scans feed the join without any Exchange below it
        assert "Exchange" not in join_section, join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(bucketed_join, sf_dir):
    spark = bucketed_join
    got = {tuple(r) for r in _joined(spark).collect()}
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    want = {
        tuple(r)
        for r in (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                ).alias("cents"),
            )
            .collect()
        )
    }
    assert got == want

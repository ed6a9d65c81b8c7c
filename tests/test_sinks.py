"""Partitioned writes must enable partition pruning; bucketed writes
must eliminate the join-time shuffle — asserted on the physical plans."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from p6_spark.sources.sinks import write_bucketed, write_partitioned
from p6_spark.sources.tables import load_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned(orders, out, ["order_year"])

    back = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = plan_of(back)
    # the partition filter must be applied at the file index, not as a
    # post-scan Filter over all years
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters:")[1][:200]
    n_pruned = back.count()
    n_full = orders.filter(F.year("o_orderdate") == 1996).count()
    assert n_pruned == n_full > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(
        orders, "ord_b", str(tmp_path / "ord_b"), ["o_orderkey"], 8, ["o_orderkey"]
    )
    try:
        lb, ob = spark.table("li_b"), spark.table("ord_b")
        # broadcast would mask the bucketing; force the merge path
        joined = lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # result parity with the plain join
        assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()

        # bucket-key aggregation also skips its shuffle
        agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        assert "Exchange" not in plan_of(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")

"""Incremental aggregation: monthly rollups from persisted daily
partials must equal the direct fact-table aggregation — exactly for the
mergeable sums, and identically for the HLL distinct estimate (register
union is lossless, so the merged sketch IS the global sketch)."""

from __future__ import annotations

from p6_spark.operators.incremental import (
    daily_order_partials,
    monthly_direct,
    monthly_from_partials,
    write_partials,
)
from p6_spark.sources.tables import load_table


def test_monthly_rollup_from_partials_equals_direct(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "daily_partials")
    write_partials(daily_order_partials(orders), path)

    got = monthly_from_partials(spark, path).toPandas().reset_index(drop=True)
    want = monthly_direct(orders).toPandas().reset_index(drop=True)

    assert list(got.columns) == list(want.columns)
    assert got[["month", "o_orderpriority", "n_orders", "cents"]].equals(
        want[["month", "o_orderpriority", "n_orders", "cents"]]
    )
    # HLL: merged day sketches give the same estimate as one global sketch
    assert (got["approx_cust"] == want["approx_cust"]).all()

"""Salted join and banded range join must be result-identical to their
naive counterparts — the rewrites change the shuffle, never the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.operators.rangejoin import banded_range_join
from p6_spark.operators.skew import salted_join
from p6_spark.sources.tables import load_table


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = li.join(part, "p_partkey").select("p_partkey", "l_extendedprice", "p_brand")
    salted = salted_join(li, part, on="p_partkey", num_salts=5)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_hot_keys_only(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    hot = [r["p_partkey"] for r in part.limit(3).collect()]
    plain = li.join(part, "p_partkey").select("p_partkey", "l_extendedprice", "p_brand")
    salted = salted_join(li, part, on="p_partkey", num_salts=5, hot_keys=hot)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_banded_range_join_equals_theta_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.range(10).select(
        (F.col("id") * 50).cast("double").alias("lo"),
        (F.col("id") * 50 + 50).cast("double").alias("hi"),
    )
    theta = ev.join(
        bands, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    ).select("event_id", "lo")
    banded = banded_range_join(ev, bands, "value", band=50.0).select("event_id", "lo")
    assert _sorted_rows(banded) == _sorted_rows(theta)


def test_banded_range_join_overlapping_intervals(spark):
    # overlapping + boundary-touching intervals; band narrower than span
    pts = spark.createDataFrame([(i, float(i)) for i in range(0, 30)], "pid long, value double")
    iv = spark.createDataFrame(
        [(0.0, 10.0), (5.0, 25.0), (10.0, 10.0), (20.0, 30.0)], "lo double, hi double"
    )
    theta = pts.join(iv, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
    banded = banded_range_join(pts, iv, "value", band=4.0)
    assert _sorted_rows(banded.select("pid", "lo", "hi")) == _sorted_rows(
        theta.select("pid", "lo", "hi")
    )

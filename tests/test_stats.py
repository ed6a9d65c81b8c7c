"""The exact-moments query must agree with Spark's built-in statistical
aggregates: correlation derived from the bigint sufficient statistics
equals F.corr on the same (rounded) columns to float precision."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from p6_spark.plans import QUERIES, get_queries
from p6_spark.sources.tables import load_table

get_queries()


def test_moments_derive_builtin_corr(spark, sf_dir):
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["q_stats_moments"].build(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_extendedprice", 0).cast("bigint").alias("x"),
        F.round("l_quantity", 0).cast("bigint").alias("y"),
    )
    builtin = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("x", "y").alias("corr"), F.var_samp("x").alias("var_x"))
        .collect()
    }
    for flag, m in rows.items():
        n, sx, sy, sx2, sy2, sxy = (
            m["n"], m["sum_x"], m["sum_y"], m["sum_x2"], m["sum_y2"], m["sum_xy"],
        )
        cov_num = n * sxy - sx * sy
        corr = cov_num / math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
        var_x = (n * sx2 - sx * sx) / (n * (n - 1))
        assert abs(corr - builtin[flag]["corr"]) < 1e-9, flag
        assert math.isclose(var_x, builtin[flag]["var_x"], rel_tol=1e-9), flag

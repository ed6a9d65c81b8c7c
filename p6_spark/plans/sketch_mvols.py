"""Mergeable histogram-sketch quantiles and multivariate OLS: the
fixed-grid quantile sketch whose per-source merge is provably lossless
(the percentile counterpart of q_hll_merge), and a two-feature
regression solved exactly by Cramer's rule over the integer normal
equations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from p6_spark.plans.registry import register
from p6_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Mergeable fixed-grid histogram sketch: merge == direct, quantiles vs exact
# ---------------------------------------------------------------------------

_HS_BUCKET_CENTS = 500_00  # fixed $500 grid


@register(
    "q_histogram_sketch_merge",
    oracle=f"""
WITH v AS (
  SELECT o_orderpriority AS src,
         cast(round(o_totalprice * 100, 0) AS bigint) AS cents
  FROM orders
),
per_src AS (
  SELECT src, cents // {_HS_BUCKET_CENTS} AS bucket, cast(count(*) AS bigint) AS n
  FROM v GROUP BY 1, 2
),
merged AS (
  SELECT bucket, cast(sum(n) AS bigint) AS n FROM per_src GROUP BY bucket
),
direct AS (
  SELECT cents // {_HS_BUCKET_CENTS} AS bucket, cast(count(*) AS bigint) AS n
  FROM v GROUP BY 1
),
diffcnt AS (
  SELECT cast(count(*) AS bigint) AS n_bucket_diff
  FROM (SELECT bucket, n FROM merged EXCEPT SELECT bucket, n FROM direct)
),
cum AS (
  SELECT bucket, n,
         sum(n) OVER (ORDER BY bucket) AS cum_n,
         sum(n) OVER () AS nt
  FROM merged
),
marks AS (
  SELECT q,
         min(bucket) FILTER (WHERE cum_n * 100 >= q * nt) AS qb
  FROM cum, (SELECT unnest([50, 90, 99]) AS q)
  GROUP BY q
),
exact_ranks AS (
  SELECT q,
         min(cents) FILTER (WHERE rn * 100 >= q * nt) AS qv
  FROM (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
               count(*) OVER () AS nt
        FROM v),
       (SELECT unnest([50, 90, 99]) AS q)
  GROUP BY q
)
SELECT cast(m.q AS bigint) AS pct,
       cast(m.qb * {_HS_BUCKET_CENTS} AS bigint) AS sketch_lo_cents,
       cast((m.qb + 1) * {_HS_BUCKET_CENTS} AS bigint) AS sketch_hi_cents,
       cast(e.qv AS bigint) AS exact_cents,
       (SELECT n_bucket_diff FROM diffcnt) AS n_bucket_diff
FROM marks m JOIN exact_ranks e ON e.q = m.q
ORDER BY pct
""",
    doc="Mergeable histogram-sketch quantiles, certified end to end: "
    "per-source fixed-$500-grid bucket counts summed (the merge a "
    "1000-executor rollup performs) equal the buckets built directly "
    "over the union (n_bucket_diff asserted 0 in-query — counts are "
    "associative sums, the percentile counterpart of q_hll_merge), and "
    "the p50/p90/p99 read off the merged sketch brackets the EXACT "
    "order statistic inside one grid cell. This is how percentile "
    "dashboards stay O(grid) per partition instead of sorting 100 TB; "
    "the exact column prices the grid error.",
    tags=("sketch", "merge", "percentile", "fixed-point"),
)
def q_histogram_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderpriority").alias("src"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per_src = v.groupBy(
        "src", F.expr(f"cents div {_HS_BUCKET_CENTS}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    merged = per_src.groupBy("bucket").agg(F.sum("n").alias("n"))
    direct = v.groupBy(F.expr(f"cents div {_HS_BUCKET_CENTS}").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    diffcnt = (
        merged.exceptAll(direct)
        .agg(F.count(F.lit(1)).alias("n_bucket_diff"))
    )
    cum = merged.select(
        "bucket",
        F.sum("n")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_n"),
        F.sum("n").over(W.partitionBy()).alias("nt"),
    )
    qs = v.sparkSession.createDataFrame([(50,), (90,), (99,)], "q int")
    marks = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum_n") * 100 >= F.col("q") * F.col("nt"))
        .groupBy("q")
        .agg(F.min("bucket").alias("qb"))
    )
    ranked = v.select(
        "cents",
        F.row_number().over(W.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nt"),
    )
    exact_ranks = (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rn") * 100 >= F.col("q") * F.col("nt"))
        .groupBy("q")
        .agg(F.min("cents").alias("qv"))
    )
    return (
        marks.join(exact_ranks, "q")
        .crossJoin(F.broadcast(diffcnt))  # 1-row scalar attach
        .select(
            F.col("q").cast("long").alias("pct"),
            (F.col("qb") * _HS_BUCKET_CENTS).cast("long").alias("sketch_lo_cents"),
            ((F.col("qb") + 1) * _HS_BUCKET_CENTS)
            .cast("long")
            .alias("sketch_hi_cents"),
            F.col("qv").alias("exact_cents"),
            "n_bucket_diff",
        )
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# Two-feature OLS by Cramer's rule over integer normal equations
# ---------------------------------------------------------------------------


@register(
    "ml_linreg2",
    oracle="""
WITH pts AS (
  SELECT cast(l_quantity AS bigint) AS x1,
         cast(round(l_discount * 100, 0) AS bigint) AS x2,
         cast(round(l_extendedprice * 100, 0) AS bigint) AS y
  FROM lineitem
),
s AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x1)::HUGEINT AS s1, sum(x2)::HUGEINT AS s2, sum(y)::HUGEINT AS sy,
         sum(x1 * x1)::HUGEINT AS s11, sum(x1 * x2)::HUGEINT AS s12,
         sum(x2 * x2)::HUGEINT AS s22,
         sum(x1 * y)::HUGEINT AS s1y, sum(x2 * y)::HUGEINT AS s2y
  FROM pts
),
d AS (
  SELECT n, sy, s1, s2,
         n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2) AS det,
         sy * (s11 * s22 - s12 * s12)
           - s1 * (s1y * s22 - s12 * s2y)
           + s2 * (s1y * s12 - s11 * s2y) AS det0,
         n * (s1y * s22 - s12 * s2y)
           - sy * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s2y - s1y * s2) AS det1,
         n * (s11 * s2y - s1y * s12)
           - s1 * (s1 * s2y - s1y * s2)
           + sy * (s1 * s12 - s11 * s2) AS det2
  FROM s
)
SELECT cast(n AS bigint) AS n,
       cast(det0 * 1000000 // det AS bigint) AS b0_cents_x1e6,
       cast(det1 * 1000000 // det AS bigint) AS b1_cents_per_qty_x1e6,
       cast(det2 * 1000000 // det AS bigint) AS b2_cents_per_discpct_x1e6
FROM d
""",
    doc="Two-feature OLS (price ~ quantity + discount%) solved EXACTLY: "
    "the 3x3 normal-equation system inverted by Cramer's rule with "
    "every determinant an integer polynomial of the nine Gramian sums "
    "(HUGEINT/decimal(38,0) — bounded because the cofactor products "
    "stay within ~1e33 at any SF the cents/qty domains allow). One "
    "aggregate over the fact table collects all nine sums; the solve "
    "is a 1-row expression — multivariate regression with the same "
    "'ML as associative sums' scale shape as ml_linreg.",
    tags=("ml", "agg", "fixed-point"),
)
def ml_linreg2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    dec = "cast(sum({e}) as decimal(38,0))"
    s = pts.agg(
        F.expr("cast(count(*) as decimal(38,0))").alias("n"),
        F.expr(dec.format(e="x1")).alias("s1"),
        F.expr(dec.format(e="x2")).alias("s2"),
        F.expr(dec.format(e="y")).alias("sy"),
        F.expr(dec.format(e="x1 * x1")).alias("s11"),
        F.expr(dec.format(e="x1 * x2")).alias("s12"),
        F.expr(dec.format(e="x2 * x2")).alias("s22"),
        F.expr(dec.format(e="x1 * y")).alias("s1y"),
        F.expr(dec.format(e="x2 * y")).alias("s2y"),
    )
    d = s.select(
        "n",
        F.expr(
            "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s12 - s11 * s2)"
        ).alias("det"),
        F.expr(
            "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
            " + s2 * (s1y * s12 - s11 * s2y)"
        ).alias("det0"),
        F.expr(
            "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s2y - s1y * s2)"
        ).alias("det1"),
        F.expr(
            "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
            " + sy * (s1 * s12 - s11 * s2)"
        ).alias("det2"),
    )
    return d.select(
        F.expr("cast(n as bigint)").alias("n"),
        F.expr("cast(det0 * 1000000 div det as bigint)").alias("b0_cents_x1e6"),
        F.expr("cast(det1 * 1000000 div det as bigint)").alias(
            "b1_cents_per_qty_x1e6"
        ),
        F.expr("cast(det2 * 1000000 div det as bigint)").alias(
            "b2_cents_per_discpct_x1e6"
        ),
    )

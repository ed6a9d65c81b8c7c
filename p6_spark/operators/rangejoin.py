"""Banded range join: point-in-interval equi-join rewrite.

A naive `points JOIN intervals ON lo <= v AND v < hi` is a non-equi
join — Spark plans it as broadcast-nested-loop, O(|points|*|intervals|)
work that dies long before 100 TB. The banded rewrite turns it into an
equi-join: bucket the value domain with width `band`, give each point
its bucket, replicate each interval into every bucket it overlaps, join
on the bucket, then apply the exact range predicate as a residual
filter. Each point lands in exactly one bucket, and an interval covers
a given bucket at most once, so no dedup is needed. Cost:
O(|points| + |intervals| * avg_span/band) shuffled on an integer key —
pick `band` near the typical interval span so replication stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    band: float = 10.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= value < hi,
    via band-bucketed equi-join (see module docstring)."""
    p = points.withColumn(
        BUCKET_COL, F.floor(F.col(value_col) / F.lit(band)).cast("long")
    )
    i = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(band)).cast("long"),
                # hi is exclusive: a bucket starting exactly at hi holds
                # no qualifying points
                F.floor(
                    (F.col(hi_col) - F.lit(1e-12)) / F.lit(band)
                ).cast("long"),
            )
        ),
    )
    out = (
        p.join(i, BUCKET_COL, how)
        .filter((F.col(lo_col) <= F.col(value_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop(BUCKET_COL)
    )
    return out

"""Harness table sources: the TPC-H-ish star schema + events stream +
documents/embeddings tables at /root/testdata/sf*/ (see TESTDATA.md).

Parquet scans are the scale path: Catalyst pushes filters and prunes
columns at the scan (check ``PushedFilters`` / ``ReadSchema`` in
``.explain("formatted")``), and partition-level parallelism comes free
from parquet row groups. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

HARNESS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows always; supplier/part scale slowly).
BROADCAST_DIMS = ("region", "nation")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """The ONE nanos->timestamp conversion for the events table — both the
    batch loader and the streaming reader (streaming/events.py) funnel
    through here so the two paths cannot drift.

    events.parquet stores TIMESTAMP(NANOS). Readers surface it one of two
    ways depending on reader path / legacy conf:
      * ``timestamp_ntz`` — already converted (nanos truncated to micros,
        matching DuckDB's ns->us truncation): nothing to do.
      * ``bigint`` — raw nanoseconds (legacy ``nanosAsLong`` path): integer
        floor-divide to micros (no double precision loss).
    The streaming schema requests TimestampNTZType explicitly, so a bigint
    ``ts`` can only mean raw nanos — never an already-scaled long.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a harness table, memoized per (session, sf_dir, table).

    A DataFrame is an immutable plan, so handing every caller the same
    object is exactly what registering a temp view once would do — and it
    skips the repeated file-listing + parquet-footer schema read that
    otherwise costs ~0.1 s per call (which dominated small-SF bench
    timings: the queries run in milliseconds, the re-reads don't).
    The cache hangs off the session object, so it dies with the session.
    """
    cache = getattr(spark, "_p6_table_cache", None)
    if cache is None:
        cache = {}
        spark._p6_table_cache = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = _load_table_uncached(spark, sf_dir, name)
        cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Legacy fallback conf for readers that reject TIMESTAMP(NANOS);
        # on Spark 4.1+ the scan yields timestamp_ntz directly and the
        # conf + bigint branch in normalize_event_ts are no-ops.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in HARNESS_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every harness table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

"""Source-format surface: the engine reads CSV and JSON (with explicit
schemas — never inferSchema on a 100 TB path: one pass to guess types is
a full extra scan) with full fidelity against the parquet ground truth,
and the compaction helper bounds output file counts."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from p6_spark.sources.sinks import compact
from p6_spark.sources.tables import load_table


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    base = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_csv")
    base.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(base.schema)  # explicit schema, no inference scan
        .option("header", True)
        .csv(path)
    )
    assert back.schema == base.schema
    a = base.orderBy("c_custkey").toPandas().reset_index(drop=True)
    b = back.orderBy("c_custkey").toPandas().reset_index(drop=True)
    assert a.equals(b)


def test_json_roundtrip_exact(spark, sf_dir, tmp_path):
    base = load_table(spark, sf_dir, "part")
    path = str(tmp_path / "part_json")
    base.write.mode("overwrite").json(path)
    back = spark.read.schema(base.schema).json(path)
    assert back.schema == base.schema
    a = base.orderBy("p_partkey").toPandas().reset_index(drop=True)
    b = back.orderBy("p_partkey").toPandas().reset_index(drop=True)
    assert a.equals(b)


def test_compact_bounds_file_count(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").repartition(64)  # fragment
    frag = str(tmp_path / "fragmented")
    li.write.mode("overwrite").parquet(frag)
    n_frag = len(glob.glob(f"{frag}/part-*.parquet"))
    assert n_frag >= 32

    compacted = str(tmp_path / "compacted")
    compact(spark.read.parquet(frag), compacted)
    n_comp = len(glob.glob(f"{compacted}/part-*.parquet"))
    assert n_comp < n_frag
    assert (
        spark.read.parquet(compacted).count()
        == spark.read.parquet(frag).count()
    )


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    # ORC is the other columnar format Spark ships a vectorized native
    # reader for; same pushdown/pruning machinery as parquet
    base = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    base.write.mode("overwrite").orc(path)
    back = spark.read.schema(base.schema).orc(path)
    assert back.schema == base.schema
    a = base.orderBy("o_orderkey").toPandas().reset_index(drop=True)
    b = back.orderBy("o_orderkey").toPandas().reset_index(drop=True)
    assert a.equals(b)
    # pushdown works on the ORC scan too
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter(F.col("o_orderkey") == 42).explain("formatted")
    assert "PushedFilters: [" in buf.getvalue()

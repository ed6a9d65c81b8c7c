"""merge_upsert edge semantics: an empty source keeps every target row
untouched; an empty target inserts every source row; unspecified insert
columns default to NULL (except the key, which takes the source value)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_empty_source_keeps_target(spark):
    from p6_spark.operators.merge import merge_upsert

    tgt = _df(spark, [(1, 10), (2, 20)], "k long, v long")
    src = _df(spark, [], "k long, delta long")
    out = merge_upsert(
        tgt, src, key="k",
        updates={"v": F.col("t.v") + F.col("s.delta")},
        inserts={"v": F.col("s.delta")},
        status_col="st",
    ).orderBy("k").collect()
    assert [(r.k, r.v, r.st) for r in out] == [(1, 10, "kept"), (2, 20, "kept")]


def test_empty_target_inserts_all(spark):
    from p6_spark.operators.merge import merge_upsert

    tgt = _df(spark, [], "k long, v long, w long")
    src = _df(spark, [(5, 50)], "k long, delta long")
    out = merge_upsert(
        tgt, src, key="k",
        updates={"v": F.col("t.v") + F.col("s.delta")},
        inserts={"v": F.col("s.delta")},  # w unspecified -> NULL on insert
        status_col="st",
    ).collect()
    assert [(r.k, r.v, r.w, r.st) for r in out] == [(5, 50, None, "inserted")]


def test_mixed_paths(spark):
    from p6_spark.operators.merge import merge_upsert

    tgt = _df(spark, [(1, 10), (2, 20)], "k long, v long")
    src = _df(spark, [(2, 200), (3, 300)], "k long, delta long")
    out = merge_upsert(
        tgt, src, key="k",
        updates={"v": F.col("t.v") + F.col("s.delta")},
        inserts={"v": F.col("s.delta")},
        status_col="st",
    ).orderBy("k").collect()
    assert [(r.k, r.v, r.st) for r in out] == [
        (1, 10, "kept"), (2, 220, "updated"), (3, 300, "inserted"),
    ]

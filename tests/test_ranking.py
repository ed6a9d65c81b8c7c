"""operators/ranking: the distributed two-phase rank must be
bit-identical to the global single-partition window it replaces — on
ranks, running sums, descending orders, chained application, and the
ntile bucket-size formula (including the n < k and n % k != 0 edges).
Stability across repeated executions is asserted because the
round-5 certification caught the sampling-based repartitionByRange
variant drifting between the offsets subtree's execution and the main
stage's (rank off by ~tens at sf0.1)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from p6_spark.operators.ranking import ntile_from_rank, two_phase_rank


def _data(spark, n=5007, seed=7):
    random.seed(seed)
    rows = [(i, random.randint(0, 1000), random.randint(1, 500)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, amt long").repartition(13)


def test_rank_and_cumsum_match_global_window(spark):
    df = _data(spark)
    got = two_phase_rank(
        df, [F.desc("v"), F.asc("id")], F.col("v"), descending=True,
        cum_cols=["amt"], buckets=8,
    )
    w = W.orderBy(F.desc("v"), "id")
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("amt")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_amt"),
    )
    g = {r.id: (r.rn, r.cum_amt) for r in got.select("id", "rn", "cum_amt").collect()}
    e = {r.id: (r.rn, r.cum_amt) for r in exp.collect()}
    assert g == e
    # execution-stable: a second run of the SAME plan yields the same ranks
    g2 = {r.id: (r.rn, r.cum_amt) for r in got.select("id", "rn", "cum_amt").collect()}
    assert g2 == e


def test_chained_ranks_match(spark):
    df = _data(spark, n=1501)
    r1 = two_phase_rank(df, [F.asc("v"), F.asc("id")], F.col("v"), rn_name="rn_v")
    r2 = two_phase_rank(r1, [F.asc("amt"), F.asc("id")], F.col("amt"), rn_name="rn_a")
    got = {r.id: (r.rn_v, r.rn_a) for r in r2.select("id", "rn_v", "rn_a").collect()}
    exp = {
        r.id: (r.rn_v, r.rn_a)
        for r in df.select(
            "id",
            F.row_number().over(W.orderBy("v", "id")).alias("rn_v"),
            F.row_number().over(W.orderBy("amt", "id")).alias("rn_a"),
        ).collect()
    }
    assert got == exp


def test_ntile_formula_matches_sql_ntile(spark):
    df = _data(spark, n=5007)
    ranked = two_phase_rank(df, [F.asc("v"), F.asc("id")], F.col("v"))
    for k in (5, 7, 10):
        got = {
            r.id: r.t
            for r in ranked.select(
                "id", ntile_from_rank(F.col("rn"), F.lit(5007), k).alias("t")
            ).collect()
        }
        exp = {
            r.id: r.t
            for r in df.select(
                "id", F.ntile(k).over(W.orderBy("v", "id")).alias("t")
            ).collect()
        }
        assert got == exp, k


def test_ntile_fewer_rows_than_tiles(spark):
    small = spark.createDataFrame([(i, i) for i in range(3)], "id long, v long")
    ranked = two_phase_rank(small, [F.asc("v"), F.asc("id")], F.col("v"))
    got = {
        r.id: r.t
        for r in ranked.select(
            "id", ntile_from_rank(F.col("rn"), F.lit(3), 5).alias("t")
        ).collect()
    }
    exp = {
        r.id: r.t
        for r in small.select(
            "id", F.ntile(5).over(W.orderBy("v", "id")).alias("t")
        ).collect()
    }
    assert got == exp


def test_no_unpartitioned_window_in_plan(spark):
    from tests.test_plan_sweep import unpartitioned_window_count

    df = _data(spark, n=501)
    got = two_phase_rank(
        df, [F.asc("v"), F.asc("id")], F.col("v"), cum_cols=["amt"]
    )
    assert unpartitioned_window_count(got) == 0


def test_partition_cols_match_per_group_window(spark):
    random.seed(11)
    rows = [
        (i, ("A", "B", "C")[i % 3], random.randint(0, 1000), random.randint(1, 500))
        for i in range(3007)
    ]
    df = spark.createDataFrame(
        rows, "id long, g string, v long, amt long"
    ).repartition(13)
    got = two_phase_rank(
        df,
        [F.asc("v"), F.asc("id")],
        F.col("v"),
        cum_cols=["amt"],
        buckets=8,
        partition_cols=["g"],
    )
    w = W.partitionBy("g").orderBy("v", "id")
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("amt")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_amt"),
    )
    g = {r.id: (r.rn, r.cum_amt) for r in got.select("id", "rn", "cum_amt").collect()}
    e = {r.id: (r.rn, r.cum_amt) for r in exp.collect()}
    assert g == e


def test_partition_cols_group_of_one_row(spark):
    # a group whose rows all land in one bucket and a group spanning all
    # buckets coexist: offsets are per (bucket, group)
    rows = [(0, "solo", 5, 1)] + [(i, "many", i, 1) for i in range(1, 900)]
    df = spark.createDataFrame(rows, "id long, g string, v long, amt long")
    got = two_phase_rank(
        df, [F.asc("v"), F.asc("id")], F.col("v"), cum_cols=["amt"],
        buckets=8, partition_cols=["g"],
    )
    res = {(r.g, r.id): (r.rn, r.cum_amt) for r in got.collect()}
    assert res[("solo", 0)] == (1, 1)
    assert res[("many", 1)] == (1, 1)
    assert res[("many", 899)] == (899, 899)


def test_constant_key_degenerates_but_stays_correct(spark):
    df = spark.createDataFrame([(i, 42) for i in range(100)], "id long, v long")
    ranked = two_phase_rank(df, [F.asc("v"), F.asc("id")], F.col("v"))
    got = sorted((r.id, r.rn) for r in ranked.select("id", "rn").collect())
    assert got == [(i, i + 1) for i in range(100)]

"""Round-8 eval-family properties: the staged-decimal pass@k expression
must equal the textbook binomial definition exactly, and Bradley-Terry
strengths must order by dominance."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from p6_spark.plans.eval_r8 import _pass_sql


def _pass_ref(n: int, c: int, k: int) -> int:
    """Reference: floor(1e6 * (1 - C(n-c,k)/C(n,k))) computed with exact
    rationals — matches the engine expression's single trunc division:
    1e6 - (num*1e6) // den, where num/den is the telescoped ratio."""
    if n - c < k:
        return 1_000_000
    assert math.comb(n - c, k) * math.perm(n, k) > 0  # definition sanity
    num = 1
    den = 1
    for i in range(k):
        num *= n - c - i
        den *= n - i
    return 1_000_000 - (num * 1_000_000) // den


@pytest.mark.parametrize("k", [1, 2, 5])
def test_pass_sql_matches_math_comb(k):
    """Sweep (n, c) panels including the estimator's edges (c=0, c=n,
    n-c just under/at/over k) and large n where the naive int64 product
    overflows — the DuckDB spelling must reproduce the exact rational
    in every cell."""
    con = duckdb.connect()
    panel = []
    for n in (k, k + 1, 7, 20, 100, 7000, 50000):
        for c in {0, 1, n // 3, n - k, n - k + 1, n - 1, n}:
            if 0 <= c <= n:
                panel.append((n, c))
    vals = ", ".join(f"({n}, {c})" for n, c in panel)
    rows = con.execute(
        f"SELECT n, c, {_pass_sql(k, 'duck')} FROM (VALUES {vals}) t(n, c)"
    ).fetchall()
    for n, c, got in rows:
        assert got == _pass_ref(n, c, k), (n, c, k)


def test_pass_sql_spark_matches_math_comb(spark):
    """Same panel through the Spark spelling (decimal(38,0) staging)."""
    panel = [
        (n, c)
        for n in (5, 6, 20, 100, 7000, 50000)
        for c in {0, 1, n // 3, n - 5, n - 4, n}
        if 0 <= c <= n
    ]
    df = spark.createDataFrame(panel, "n long, c long").select(
        "n", "c", F.expr(_pass_sql(5, "spark")).alias("p")
    )
    for r in df.collect():
        assert r["p"] == _pass_ref(int(r["n"]), int(r["c"]), 5), tuple(r)


def test_bt_strength_orders_by_dominance(spark, tmp_path):
    """A type that wins every match must end iteration 2 strictly
    strongest; one that loses every match, strictly weakest. Built on a
    synthetic events panel where values encode a strict hierarchy."""
    from p6_spark.plans.eval_r8 import ml_bt_strength

    rows = []
    eid = 0
    rank = {"alpha": 3.0, "beta": 2.0, "gamma": 1.0}
    for u in range(30):
        for t in ("alpha", "beta", "gamma", "alpha", "gamma", "beta"):
            rows.append((eid, u, t, rank[t] + (u % 3) * 0.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    d = str(tmp_path / "sf")
    df.selectExpr(
        "event_id", "timestamp'2024-01-01' as ts", "user_id", "event_type",
        "value", "cast(null as string) as props"
    ).write.parquet(f"{d}/events.parquet")
    got = {r["event_type"]: r for r in ml_bt_strength(spark, d).collect()}
    assert got["alpha"]["wins"] == got["alpha"]["games"]  # never loses
    assert got["gamma"]["wins"] == 0
    assert got["alpha"]["w2_x1e6"] > got["beta"]["w2_x1e6"] > got["gamma"]["w2_x1e6"]

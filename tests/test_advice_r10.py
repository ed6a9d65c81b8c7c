"""Round-10 ADVICE hardening: the two remaining NULL/zero edges in the
round-9 inference family now fail loudly and IDENTICALLY on both
engines — (1) ml_tost_equivalence on zero-variance arms (se2 = 0 was an
engine-specific float division by zero: Spark Infinity vs DuckDB
error), and (2) ml_conformal_threshold on an EMPTY calibration split
(min over zero rows makes n_cal NULL, so a bare ``k > n_cal`` CASE is
NULL-skipped and NULL thresholds flowed through silently)."""

from __future__ import annotations

import os

import duckdb
import pytest

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _duck_con(sf_dir: str, table: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')".format(
            t=table, p=os.path.join(sf_dir, table + ".parquet", "*.parquet")
        )
    )
    return con


def test_tost_zero_variance_raises_identically(spark, tmp_path):
    """Both arms present and big enough, but constant-valued: se2 = 0.
    Without the guard Spark produces x/0.0 = Infinity (then a cast
    error) while DuckDB errors — now both raise the SAME named error
    BEFORE the division."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "click", 10.0),
            (2, "click", 10.0),
            (3, "purchase", 10.0),
            (4, "purchase", 10.0),
        ],
        "event_id long, event_type string, value double",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))

    with pytest.raises(Exception, match="zero-variance"):
        get_queries()["ml_tost_equivalence"](spark, sf_dir).collect()

    con = _duck_con(sf_dir, "events")
    try:
        with pytest.raises(duckdb.Error, match="zero-variance"):
            con.execute(QUERIES["ml_tost_equivalence"].oracle).fetchall()
    finally:
        con.close()


def test_conformal_empty_calibration_raises_identically(spark, tmp_path):
    """All-odd orderkeys -> the even-orderkey calibration split is
    EMPTY: min(n_cal) is NULL, k is NULL, and the old ``k > n_cal``
    guard was NULL-skipped (silently yielding NULL thresholds and
    coverage_x1e6 = 0). The extended guard catches the NULLs."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, 5.0, 100.0), (3, 2.0, 50.0), (7, 1.0, 990.0)],
        "l_orderkey long, l_quantity double, l_extendedprice double",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    with pytest.raises(Exception, match="calibration set too"):
        get_queries()["ml_conformal_threshold"](spark, sf_dir).collect()

    con = _duck_con(sf_dir, "lineitem")
    try:
        with pytest.raises(duckdb.Error, match="calibration set too"):
            con.execute(QUERIES["ml_conformal_threshold"].oracle).fetchall()
    finally:
        con.close()


@pytest.mark.parametrize(
    "name", ["ml_tost_equivalence", "ml_conformal_threshold"]
)
def test_guards_invisible_on_clean_corpus(spark, name):
    """The new guard arms must not perturb non-degenerate runs (the
    oracle sweep separately pins exact values at sf0.01)."""
    assert get_queries()[name](spark, SF).count() > 0

"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's t2 gate (which runs sf0.01)."""

from __future__ import annotations

import pytest

from p6_spark.plans import QUERIES, get_queries
from tests.oracle_utils import compare, run_oracle

get_queries()  # populate registry
ORACLE_QUERIES = [name for name, q in sorted(QUERIES.items()) if q.oracle is not None]
ROWS_ONLY = [name for name, q in sorted(QUERIES.items()) if q.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    spark_pdf = q.build(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

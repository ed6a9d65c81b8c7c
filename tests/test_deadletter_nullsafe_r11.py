"""Null-safe dead-letter routing (round-11 ADVICE): audit.dead_letter_rows
must route a NULL-predicate row to the DEAD side — the naive
filter(pred)/filter(~pred) pair drops it from BOTH sides under ANSI
three-valued logic, silently losing rows despite the rows-routed-never-
lost contract. The quality twins' ``size(tokens) >= 1`` predicate is
NULL for NULL text, so a NULL-text corpus is the failure driver. Pins:
(a) unit: valid + dead == total with NULL predicates present,
(b) both quality twins count NULL-text docs as deadletter and match
their (coalesce-mirrored) DuckDB oracles on a NULL-text corpus."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from p6_spark.audit import dead_letter_rows
from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES
from tests.oracle_utils import canonicalize, compare

import duckdb

NULLY_DOCS = [
    (0, "a normal document with words", "en", "web", 28),
    (1, None, "en", "web", None),  # NULL text -> NULL token list
    (2, "another fine document here", "en", "web", 26),
    (3, "", "de", "web", 0),  # empty -> zero tokens (false, not NULL)
    (4, None, "fr", "web", None),  # lang with ONLY a NULL doc
]


def _write_nully(spark, path: str) -> None:
    spark.createDataFrame(
        NULLY_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


def test_null_predicate_routes_to_dead_side_not_lost(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 0)], "id long, x long"
    )
    valid, dead = dead_letter_rows(df, F.col("x") >= 1)
    assert sorted(r["id"] for r in valid.collect()) == [1]
    assert sorted(r["id"] for r in dead.collect()) == [2, 3]


@pytest.mark.parametrize(
    "name",
    ["pipe_quality_budget_cut_deadletter", "pipe_percentile_prune_deadletter"],
)
def test_quality_twins_route_null_text_and_match_oracle(spark, tmp_path, name):
    sf_dir = str(tmp_path)
    _write_nully(spark, sf_dir)
    rows = get_queries()[name](spark, sf_dir).collect()
    if name == "pipe_quality_budget_cut_deadletter":
        dl = {
            r["lang"]: r["n_docs"]
            for r in rows
            if r["status"] == "deadletter"
        }
    else:
        dl = {r["lang"]: r["n_deadletter"] for r in rows}
        assert dl.get("fr") == 1  # all-NULL lang still present (full join)
    assert dl.get("en") == 1  # the NULL-text doc, counted not lost
    assert dl.get("de") == 1  # the empty doc

    spark_pdf = canonicalize(pd.DataFrame([r.asDict() for r in rows]))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "documents.parquet", "*.parquet")
            )
        )
        oracle_pdf = canonicalize(con.execute(QUERIES[name].oracle).fetchdf())
    finally:
        con.close()
    assert compare(spark_pdf, oracle_pdf) == []

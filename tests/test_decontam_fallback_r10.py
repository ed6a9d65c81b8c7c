"""dd_decontam_ngram13's broadcast-size guard (VERDICT r9 #2): the
bench-shingle broadcast is only safe while the eval split is
eval-set-sized; above _DECON_BROADCAST_MAX_BENCH_DOCS the plan must
degrade to a shuffle-hash semi-join. Pins: (a) the fallback path is
value-identical to the broadcast path and to the DuckDB oracle,
(b) the fallback plan actually shuffles (no broadcast of the bench
side), (c) the auto-selector picks broadcast under the threshold."""

from __future__ import annotations

import pytest

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES
from p6_spark.plans.rigor_r9 import (
    _DECON_BROADCAST_MAX_BENCH_DOCS,
    _decontam_ngram13_plan,
)
from tests.oracle_utils import compare, run_oracle

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fallback_path_matches_broadcast_path_and_oracle(spark):
    broadcast = _rows(_decontam_ngram13_plan(spark, SF, force_shuffle=False))
    shuffle = _rows(_decontam_ngram13_plan(spark, SF, force_shuffle=True))
    assert broadcast == shuffle
    # and the SAME oracle certifies the forced-fallback plan
    spark_pdf = _decontam_ngram13_plan(spark, SF, force_shuffle=True).toPandas()
    oracle_pdf = run_oracle(QUERIES["dd_decontam_ngram13"].oracle, SF)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)


def test_fallback_plan_shuffles_the_bench_side(spark):
    """The SHINGLE-keyed join (key ``s``) must flip strategy; the final
    doc_id join of the small flagged set stays broadcast on BOTH paths
    (it is driver-bounded output, not the bench side)."""
    import re

    def s_joins(plan: str) -> list[str]:
        return re.findall(r"(\w+HashJoin) \[s#", plan)

    shuffle_plan = _decontam_ngram13_plan(
        spark, SF, force_shuffle=True
    )._jdf.queryExecution().executedPlan().toString()
    broadcast_plan = _decontam_ngram13_plan(
        spark, SF, force_shuffle=False
    )._jdf.queryExecution().executedPlan().toString()
    assert s_joins(shuffle_plan) == ["ShuffledHashJoin"]
    assert s_joins(broadcast_plan) == ["BroadcastHashJoin"]


def test_auto_selector_broadcasts_below_threshold(spark):
    """sf0.001 has far fewer than the crossover's bench docs, so the
    registered query must choose the broadcast plan."""
    from p6_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    n_bench = docs.filter(F.col("doc_id") % 97 == 0).count()
    assert n_bench <= _DECON_BROADCAST_MAX_BENCH_DOCS
    plan = (
        get_queries()["dd_decontam_ngram13"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan

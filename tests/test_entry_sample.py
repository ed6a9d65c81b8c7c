"""The rotating driver-sample proposal in __spark_entry__ (VERDICT r8
item 5): deterministic, 50 names, valid, and actually rotating."""

from __future__ import annotations

import __spark_entry__ as e


def test_proposed_sample_is_deterministic_and_valid():
    names = set(e.queries())
    s1 = e.proposed_sample(round_no=9)
    s2 = e.proposed_sample(round_no=9)
    assert s1 == s2
    assert len(s1) == e._FIXED_N + e._ROTATING_N == 50
    assert len(set(s1)) == 50
    assert set(s1) <= names


def test_sample_rotates_across_rounds_with_stable_anchors():
    s9 = e.proposed_sample(round_no=9)
    s10 = e.proposed_sample(round_no=10)
    assert s9[: e._FIXED_N] == s10[: e._FIXED_N]  # anchors stable
    assert s9[e._FIXED_N :] != s10[e._FIXED_N :]  # rotation rotates


def test_queries_iteration_order_leads_with_the_sample():
    order = list(e.queries())
    assert order[:50] == e.proposed_sample()
    # and the mapping itself is complete and un-reordered in content
    from p6_spark.plans import get_queries

    assert set(order) == set(get_queries())

"""Round-9 eval-rigor family properties: each operator is checked
against an INDEPENDENT third implementation (plain pandas/Python over
the same parquet — not the DuckDB oracle, which the sweep already
replays), plus the estimators' edge cases."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from p6_spark.plans import get_queries

SF = "/root/testdata/sf0.001"


def _li() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------------------
# ml_mcnemar_test
# ---------------------------------------------------------------------------


def _mcnemar_ref(b: int, c: int) -> int:
    if b + c == 0:
        return 0
    d = max(abs(b - c) - 1, 0)
    return (d * d * 1_000_000) // (b + c)


def test_mcnemar_matches_pandas_reference(spark):
    li = _li()
    a_ok = (li["l_quantity"] >= 25).astype(int)
    b_ok = (li["l_extendedprice"] >= 30000).astype(int)
    b = int(((a_ok == 1) & (b_ok == 0)).sum())
    c = int(((a_ok == 0) & (b_ok == 1)).sum())
    row = get_queries()["ml_mcnemar_test"](spark, SF).first()
    assert row["n_a_only"] == b and row["n_b_only"] == c
    assert row["n"] == len(li)
    assert row["chi2_cc_x1e6"] == _mcnemar_ref(b, c)
    assert row["better"] == ("A" if b > c else "B" if c > b else "tie")


def test_mcnemar_statistic_edges(spark):
    """b + c = 0 and |b - c| <= 1 both define chi2 = 0; a hand case pins
    the continuity correction: b=10, c=2 -> (8-1)^2... wait, |10-2|-1=7,
    49e6 // 12 = 4083333."""
    cells = spark.createDataFrame(
        [(0, 0), (3, 3), (5, 4), (10, 2)], "n_a_only long, n_b_only long"
    )
    got = {
        (r["n_a_only"], r["n_b_only"]): r["chi2"]
        for r in cells.select(
            "n_a_only",
            "n_b_only",
            F.expr(
                "CASE WHEN n_a_only + n_b_only = 0 THEN 0"
                " ELSE cast((greatest(abs(n_a_only - n_b_only) - 1, 0)"
                "            * greatest(abs(n_a_only - n_b_only) - 1, 0)"
                "            * cast(1000000 as bigint))"
                " div (n_a_only + n_b_only) AS bigint) END"
            ).alias("chi2"),
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(3, 3)] == 0  # |b-c| = 0 -> corrected to 0
    assert got[(5, 4)] == 0  # |b-c| = 1 -> corrected to 0
    assert got[(10, 2)] == (7 * 7 * 1_000_000) // 12


# ---------------------------------------------------------------------------
# ml_average_precision
# ---------------------------------------------------------------------------


def test_average_precision_matches_pandas_reference(spark):
    li = _li().copy()
    li["score_c"] = (li["l_extendedprice"] * 100).round(0).astype("int64")
    li["y"] = (li["l_quantity"] >= 25).astype(int)
    li = li.sort_values(
        ["score_c", "l_orderkey", "l_linenumber"],
        ascending=[False, True, True],
    ).reset_index(drop=True)
    li["rn"] = li.index + 1
    li["cum_y"] = li["y"].cumsum()
    pos = li[li["y"] == 1]
    ap_ref = int(
        sum((cy * 1_000_000) // rn for cy, rn in zip(pos["cum_y"], pos["rn"]))
        // len(pos)
    )
    row = get_queries()["ml_average_precision"](spark, SF).first()
    assert row["n"] == len(li)
    assert row["n_pos"] == len(pos)
    assert row["ap_x1e6"] == ap_ref
    # AP of this panel must beat the base rate (scores correlate with
    # labels is NOT assumed — but AP >= P/n holds for any ranking only
    # in expectation; assert the hard bounds instead)
    assert 0 <= row["ap_x1e6"] <= 1_000_000


# ---------------------------------------------------------------------------
# ml_macro_f1
# ---------------------------------------------------------------------------


def test_macro_f1_matches_pandas_reference(spark):
    li = _li()
    truth = pd.cut(
        li["l_quantity"], [-1, 16.999, 33.999, 1e9], labels=["low", "mid", "high"]
    ).astype(str)
    pred = pd.cut(
        li["l_extendedprice"],
        [-1, 34999.999, 69999.999, 1e18],
        labels=["low", "mid", "high"],
    ).astype(str)
    rows = {
        r["cls"]: r for r in get_queries()["ml_macro_f1"](spark, SF).collect()
    }
    f1s = []
    for cls in ("high", "low", "mid"):
        tp = int(((truth == cls) & (pred == cls)).sum())
        fp = int(((pred == cls) & (truth != cls)).sum())
        fn = int(((truth == cls) & (pred != cls)).sum())
        p = (tp * 1_000_000) // (tp + fp) if tp + fp else 0
        rc = (tp * 1_000_000) // (tp + fn) if tp + fn else 0
        f1 = (2 * p * rc) // (p + rc) if p + rc else 0
        f1s.append(f1)
        r = rows[cls]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn), cls
        assert (r["prec_x1e6"], r["rec_x1e6"], r["f1_x1e6"]) == (p, rc, f1), cls
    macro = sum(f1s) // 3
    assert all(r["macro_f1_x1e6"] == macro for r in rows.values())


# ---------------------------------------------------------------------------
# ml_winrate_wilson
# ---------------------------------------------------------------------------


def test_wilson_bounds_cross_engine_identical_on_edge_panel(spark):
    """The IEEE-sqrt convention's real gate: identical integers from
    both engines on the estimator's edges (w=0, w=n, n=1, large n,
    near-half rates)."""
    from p6_spark.plans.rigor_r9 import _WILSON_HI, _WILSON_LO

    panel = [
        (0, 1), (1, 1), (0, 100), (100, 100), (50, 100), (49, 99),
        (1, 1000000), (999999, 1000000), (123456, 654321),
    ]
    got = (
        spark.createDataFrame(panel, "a_wins long, n_games long")
        .select(
            "a_wins",
            "n_games",
            F.expr(_WILSON_LO).alias("lo"),
            F.expr(_WILSON_HI).alias("hi"),
        )
        .orderBy("n_games", "a_wins")
        .collect()
    )
    con = duckdb.connect()
    try:
        vals = ", ".join(f"({w}::BIGINT, {n}::BIGINT)" for w, n in panel)
        oracle = con.execute(
            f"SELECT a_wins, n_games, {_WILSON_LO} AS lo, {_WILSON_HI} AS hi"
            f" FROM (VALUES {vals}) t(a_wins, n_games)"
            " ORDER BY n_games, a_wins"
        ).fetchall()
    finally:
        con.close()
    assert [(r["a_wins"], r["n_games"], r["lo"], r["hi"]) for r in got] == [
        tuple(r) for r in oracle
    ]
    for r in got:
        rate = (r["a_wins"] * 1_000_000) // r["n_games"]
        assert -1 <= r["lo"] <= rate + 1  # lo below the point estimate
        assert rate - 1 <= r["hi"] <= 1_000_001  # hi above it
        assert r["lo"] <= r["hi"]


def test_wilson_interval_tightens_with_n(spark):
    """Same 50% rate at n=10 vs n=10000: the interval must shrink."""
    from p6_spark.plans.rigor_r9 import _WILSON_HI, _WILSON_LO

    df = spark.createDataFrame(
        [(5, 10), (5000, 10000)], "a_wins long, n_games long"
    ).select(
        "n_games",
        (F.expr(_WILSON_HI) - F.expr(_WILSON_LO)).alias("width"),
    )
    w = {r["n_games"]: r["width"] for r in df.collect()}
    assert w[10000] < w[10]


# ---------------------------------------------------------------------------
# pipe_quality_budget_cut
# ---------------------------------------------------------------------------


def test_budget_cut_matches_pandas_reference(spark):
    docs = _docs().copy()
    toks = docs["text"].str.strip().str.split()
    docs["n_tok"] = toks.map(len)
    docs["q"] = [
        (len(set(t)) * 1_000_000) // len(t) for t in toks
    ]
    docs = docs.sort_values(["q", "doc_id"], ascending=[False, True])
    docs["cum"] = docs["n_tok"].cumsum()
    budget = int(docs["n_tok"].sum()) // 4
    docs["selected"] = docs["cum"] <= budget
    ref = (
        docs.groupby(["selected", "lang"])
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_tok", "sum"),
             min_q=("q", "min"))
        .reset_index()
    )
    got = {
        (r["selected"], r["lang"]): (r["n_docs"], r["n_tokens"],
                                     r["min_qscore_x1e6"])
        for r in get_queries()["pipe_quality_budget_cut"](spark, SF).collect()
    }
    for _, row in ref.iterrows():
        key = (bool(row["selected"]), row["lang"])
        assert got[key] == (row["n_docs"], row["n_tokens"], row["min_q"]), key
    # and the selection really respects the budget
    sel_tokens = sum(v[1] for k, v in got.items() if k[0])
    assert sel_tokens <= budget


# ---------------------------------------------------------------------------
# pipe_data_epochs
# ---------------------------------------------------------------------------


def test_data_epochs_grants_are_consistent(spark):
    from p6_spark.plans.rigor_r9 import _EPOCH_CAP, _MIX_W

    rows = get_queries()["pipe_data_epochs"](spark, SF).collect()
    assert {r["lang"] for r in rows} == set(_MIX_W)
    total_avail = sum(r["avail_chars"] for r in rows)
    for r in rows:
        # demand = mixture share of a 2x-corpus target, trunc div
        assert r["target_chars"] == (
            2 * total_avail * _MIX_W[r["lang"]]
        ) // 1_000_000
        assert r["granted_chars"] == min(
            r["target_chars"], _EPOCH_CAP * r["avail_chars"]
        )
        assert r["epochs_x1e6"] == (
            r["granted_chars"] * 1_000_000
        ) // r["avail_chars"]
        assert 0 <= r["epochs_x1e6"] <= _EPOCH_CAP * 1_000_000
        assert r["unmet_chars"] == max(
            0, r["target_chars"] - _EPOCH_CAP * r["avail_chars"]
        )


# ---------------------------------------------------------------------------
# dd_decontam_ngram13
# ---------------------------------------------------------------------------


def test_decontam_matches_pandas_reference(spark):
    from p6_spark.plans.rigor_r9 import _DECON_N

    docs = _docs().copy()

    def shingles(text: str) -> set:
        t = text.strip().split()
        if len(t) >= _DECON_N:
            return {
                " ".join(t[i : i + _DECON_N])
                for i in range(len(t) - _DECON_N + 1)
            }
        return {" ".join(t)}

    docs["sh"] = docs["text"].map(shingles)
    bench = set().union(*docs[docs["doc_id"] % 97 == 0]["sh"])
    train = docs[docs["doc_id"] % 97 != 0].copy()
    train["flagged"] = train["sh"].map(lambda s: bool(s & bench))
    ref = train.groupby("source").agg(
        n_docs=("doc_id", "size"), n_flagged=("flagged", "sum")
    )
    got = {
        r["source"]: r
        for r in get_queries()["dd_decontam_ngram13"](spark, SF).collect()
    }
    assert set(got) == set(ref.index)
    for src, row in ref.iterrows():
        g = got[src]
        assert (g["n_docs"], g["n_flagged"]) == (
            row["n_docs"], row["n_flagged"]), src
        assert g["flag_rate_x1e6"] == (
            int(row["n_flagged"]) * 1_000_000
        ) // int(row["n_docs"])

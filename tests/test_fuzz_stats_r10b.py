"""Round-10 differential fuzzing, part 2: the rest of the round-9
eval-rigor family — McNemar, average precision, macro-F1, Wilson
win-rate matrix, split-conformal thresholds, IPS/SNIPS, and the
derandomized Poisson bootstrap — on ~100 seeded random panels each
against pure-Python exact references (same harness design as
test_fuzz_stats_r10.py: every panel through the DuckDB oracle,
a 3-seed subset through the Spark builder)."""

from __future__ import annotations

import os
import hashlib
import math
import random
from bisect import bisect_right

import duckdb
import pandas as pd
import pytest

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES
from tests.test_fuzz_stats_r10 import SPARK_SEEDS, _duck, _spark_run, rha, tdiv

get_queries()

# Driver-budget gating (round 12, VERDICT r11 item 5): the full fuzz
# panels (~4,500 parametrized cases across the r10/r11 files) pushed
# the default pytest run past the driver wall budget (VERIFY_r11
# tests_ok=false, tail cut at 81%). Default = the seeded first 12
# cases per panel (deterministic, still covers the generator shape
# classes); P6_FUZZ_FULL=1 restores the full sweep — run it in build
# rounds / before changing any covered operator.
SEEDS = list(range(100 if os.environ.get("P6_FUZZ_FULL") == "1" else 12))


# ---------------------------------------------------------------------------
# ml_mcnemar_test
# ---------------------------------------------------------------------------


def _mcnemar_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(61_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    rows = []
    for _ in range(n):
        q = float(rng.randint(0, 50))
        if shape == 0:
            # perfectly concordant: b + c = 0 -> chi2 defined as 0
            price = 60_000.0 if q >= 25 else 0.0
        else:
            price = float(rng.randint(0, 60_000))
        rows.append((q, price))
    return pd.DataFrame(rows, columns=["l_quantity", "l_extendedprice"])


def _mcnemar_ref(pdf: pd.DataFrame) -> dict:
    a = (pdf["l_quantity"] >= 25).astype(int)
    b = (pdf["l_extendedprice"] >= 30_000).astype(int)
    n_both = int((a & b).sum())
    n_a = int((a & (1 - b)).sum())
    n_b = int(((1 - a) & b).sum())
    n_nei = int(((1 - a) & (1 - b)).sum())
    if n_a + n_b == 0:
        chi2 = 0
    else:
        d = max(abs(n_a - n_b) - 1, 0)
        chi2 = (d * d * 1_000_000) // (n_a + n_b)
    return {
        "n": len(pdf), "n_both": n_both, "n_a_only": n_a, "n_b_only": n_b,
        "n_neither": n_nei, "chi2_cc_x1e6": chi2,
        "better": "A" if n_a > n_b else ("B" if n_b > n_a else "tie"),
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_mcnemar(seed):
    pdf = _mcnemar_panel(seed)
    got = _duck({"lineitem": pdf}, QUERIES["ml_mcnemar_test"].oracle)
    assert got.iloc[0].to_dict() == _mcnemar_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_mcnemar_spark(spark, tmp_path, seed):
    pdf = _mcnemar_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "ml_mcnemar_test", {"lineitem": pdf},
        {"lineitem": "l_quantity double, l_extendedprice double"},
    )
    assert df.first().asDict() == _mcnemar_ref(pdf)


# ---------------------------------------------------------------------------
# ml_average_precision
# ---------------------------------------------------------------------------


def _ap_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(62_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    spread = rng.choice([5, 200, 50_000])  # tiny spread -> heavy ties
    rows = []
    for i in range(n):
        price = rng.randint(0, spread) / 100
        q = 0.0 if shape == 0 else float(rng.randint(0, 50))  # shape 0: no pos
        rows.append((i // 7, i % 7 + 1, q, price))
    return pd.DataFrame(
        rows,
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )


def _ap_ref(pdf: pd.DataFrame) -> dict:
    rows = sorted(
        (
            (-rha(p * 100), k, ln, 1 if q >= 25 else 0)
            for k, ln, q, p in zip(
                pdf["l_orderkey"], pdf["l_linenumber"],
                pdf["l_quantity"], pdf["l_extendedprice"],
            )
        )
    )
    cum = 0
    total = 0
    n_pos = sum(r[3] for r in rows)
    for rn, (_, _, _, y) in enumerate(rows, start=1):
        cum += y
        if y:
            total += (cum * 1_000_000) // rn
    return {
        "n": len(rows), "n_pos": n_pos,
        "ap_x1e6": 0 if n_pos == 0 else total // n_pos,
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_average_precision(seed):
    pdf = _ap_panel(seed)
    got = _duck({"lineitem": pdf}, QUERIES["ml_average_precision"].oracle)
    assert got.iloc[0].to_dict() == _ap_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_average_precision_spark(spark, tmp_path, seed):
    pdf = _ap_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "ml_average_precision", {"lineitem": pdf},
        {
            "lineitem": "l_orderkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double"
        },
    )
    assert df.first().asDict() == _ap_ref(pdf)


# ---------------------------------------------------------------------------
# ml_macro_f1
# ---------------------------------------------------------------------------


def _f1_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(63_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    rows = []
    for _ in range(n):
        if shape == 0:
            q, price = 5.0, 1_000.0  # single class both sides
        else:
            q = float(rng.randint(0, 50))
            price = float(rng.randint(0, 100_000))
        rows.append((q, price))
    return pd.DataFrame(rows, columns=["l_quantity", "l_extendedprice"])


def _f1_ref(pdf: pd.DataFrame) -> list[dict]:
    from collections import Counter

    def tcat(q):
        return "low" if q < 17 else ("mid" if q < 34 else "high")

    def pcat(p):
        return "low" if p < 35_000 else ("mid" if p < 70_000 else "high")

    cells = Counter(
        (tcat(q), pcat(p))
        for q, p in zip(pdf["l_quantity"], pdf["l_extendedprice"])
    )
    classes = sorted(
        {t for t, _ in cells} | {p for _, p in cells}
    )
    per = []
    for cls in classes:
        tp = cells.get((cls, cls), 0)
        fp = sum(c for (t, p), c in cells.items() if p == cls and t != cls)
        fn = sum(c for (t, p), c in cells.items() if t == cls and p != cls)
        prec = 0 if tp + fp == 0 else (tp * 1_000_000) // (tp + fp)
        rec = 0 if tp + fn == 0 else (tp * 1_000_000) // (tp + fn)
        f1 = 0 if prec + rec == 0 else (2 * prec * rec) // (prec + rec)
        per.append(
            {"cls": cls, "tp": tp, "fp": fp, "fn": fn,
             "prec_x1e6": prec, "rec_x1e6": rec, "f1_x1e6": f1}
        )
    macro = sum(r["f1_x1e6"] for r in per) // len(per)
    for r in per:
        r["macro_f1_x1e6"] = macro
    return per


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_macro_f1(seed):
    pdf = _f1_panel(seed)
    got = _duck({"lineitem": pdf}, QUERIES["ml_macro_f1"].oracle)
    assert got.to_dict("records") == _f1_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_macro_f1_spark(spark, tmp_path, seed):
    pdf = _f1_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "ml_macro_f1", {"lineitem": pdf},
        {"lineitem": "l_quantity double, l_extendedprice double"},
    )
    assert [r.asDict() for r in df.collect()] == _f1_ref(pdf)


# ---------------------------------------------------------------------------
# ml_winrate_wilson (battle matrix from the shared match-stream CTEs)
# ---------------------------------------------------------------------------

_ETYPES = ["click", "purchase", "view", "scroll", "search"]


def _events_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(64_000 + seed)
    shape = seed % 10
    n_users = rng.randint(1, 200)
    rows = []
    eid = 0
    for u in range(n_users):
        for _ in range(1 if shape == 0 else rng.randint(1, 60)):
            eid += 1
            rows.append(
                (u, eid, rng.choice(_ETYPES), float(rng.randint(0, 100)))
            )
    return pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "value"]
    )


def _matches(pdf: pd.DataFrame):
    out = []
    for _, grp in pdf.sort_values("event_id").groupby("user_id"):
        prev_t = prev_v = None
        for t, v in zip(grp["event_type"], grp["value"]):
            if prev_t is not None and prev_t != t:
                a_beats = v > prev_v or (v == prev_v and t < prev_t)
                out.append((t, prev_t) if a_beats else (prev_t, t))
            prev_t, prev_v = t, v
    return out


def _wilson_ref(pdf: pd.DataFrame) -> list[dict]:
    from collections import defaultdict

    cells: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for winner, loser in _matches(pdf):
        t_a, t_b = sorted((winner, loser))
        c = cells[(t_a, t_b)]
        c[0] += 1
        c[1] += 1 if winner < loser else 0
    out = []
    for (t_a, t_b), (n, w) in sorted(cells.items()):
        half = math.sqrt(w * (n - w) / n + 0.9604)
        lo = rha(((w + 1.9208 - 1.96 * half) / (n + 3.8416)) * 1_000_000)
        hi = rha(((w + 1.9208 + 1.96 * half) / (n + 3.8416)) * 1_000_000)
        out.append(
            {"t_a": t_a, "t_b": t_b, "n_games": n, "a_wins": w,
             "winrate_x1e6": (w * 1_000_000) // n,
             "wilson_lo_x1e6": lo, "wilson_hi_x1e6": hi}
        )
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_winrate_wilson(seed):
    pdf = _events_panel(seed)
    want = _wilson_ref(pdf)
    got = _duck({"events": pdf}, QUERIES["ml_winrate_wilson"].oracle)
    assert got.to_dict("records") == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_winrate_wilson_spark(spark, tmp_path, seed):
    pdf = _events_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "ml_winrate_wilson", {"events": pdf},
        {"events": "user_id long, event_id long, event_type string,"
                   " value double"},
    )
    assert [r.asDict() for r in df.collect()] == _wilson_ref(pdf)


# ---------------------------------------------------------------------------
# ml_ips_offpolicy (same events panel)
# ---------------------------------------------------------------------------


def _ips_ref(pdf: pd.DataFrame) -> dict:
    from collections import Counter, defaultdict

    cells = Counter()
    rewards = Counter()
    for u, t, v in zip(pdf["user_id"], pdf["event_type"], pdf["value"]):
        ctx = u % 10
        cells[(ctx, t)] += 1
        rewards[(ctx, t)] += 1 if v >= 50 else 0
    n_x: dict[int, int] = defaultdict(int)
    n_act: dict[int, int] = defaultdict(int)
    for (ctx, _), c in cells.items():
        n_x[ctx] += c
        n_act[ctx] += 1
    n = sum(cells.values())
    n_rewarded = sum(rewards.values())
    sum_rw = sum_w = 0
    for (ctx, t), n_xa in cells.items():
        w = (n_x[ctx] * 1_000_000) // (n_act[ctx] * n_xa)
        sum_rw += rewards[(ctx, t)] * w
        sum_w += n_xa * w
    return {
        "n": n, "n_rewarded": n_rewarded,
        "logging_value_x1e6": (n_rewarded * 1_000_000) // n,
        "ips_x1e6": sum_rw // n,
        "snips_x1e6": (sum_rw * 1_000_000) // sum_w,
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_ips(seed):
    pdf = _events_panel(seed)
    got = _duck({"events": pdf}, QUERIES["ml_ips_offpolicy"].oracle)
    assert got.iloc[0].to_dict() == _ips_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_ips_spark(spark, tmp_path, seed):
    pdf = _events_panel(seed)
    df = _spark_run(
        spark, tmp_path, 500 + seed, "ml_ips_offpolicy", {"events": pdf},
        {"events": "user_id long, event_id long, event_type string,"
                   " value double"},
    )
    assert df.first().asDict() == _ips_ref(pdf)


# ---------------------------------------------------------------------------
# ml_conformal_threshold
# ---------------------------------------------------------------------------

_ALPHAS = [10, 5, 1]


def _conf_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(65_000 + seed)
    shape = seed % 10
    n = rng.randint(2, 10_000)
    rows = []
    for i in range(n):
        if shape == 0:
            k = 2 * i + 1  # all odd -> EMPTY calibration -> raise
        elif shape == 1:
            k = 2 if i == 0 else 2 * i + 1  # n_cal = 1 -> k > n_cal raise
        else:
            k = i
        rows.append((k, float(rng.randint(0, 50)), rng.randint(0, 99_999) / 100))
    # guarantee a holdout row exists (odd key) on non-degenerate shapes
    if shape > 1:
        rows.append((1, 3.0, 42.0))
    return pd.DataFrame(
        rows, columns=["l_orderkey", "l_quantity", "l_extendedprice"]
    )


def _conf_ref(pdf: pd.DataFrame):
    scores = [
        (abs(rha(p * 100) - int(q) * 100_000), k % 2 == 0)
        for k, q, p in zip(
            pdf["l_orderkey"], pdf["l_quantity"], pdf["l_extendedprice"]
        )
    ]
    cal = sorted(s for s, is_cal in scores if is_cal)
    hold = [s for s, is_cal in scores if not is_cal]
    n_cal = len(cal)
    rows = []
    for alpha in sorted(_ALPHAS, reverse=True):
        k = ((n_cal + 1) * (100 - alpha) + 99) // 100
        if n_cal == 0 or k > n_cal:
            return "calibration set too"
        thr = cal[k - 1]
        cov = sum(1 for s in hold if s <= thr)
        rows.append(
            {
                "alpha_x100": alpha, "n_cal": n_cal, "k": k, "threshold": thr,
                "n_holdout": len(hold),
                "coverage_x1e6": (cov * 1_000_000) // len(hold),
                "target_x1e6": (100 - alpha) * 10_000,
            }
        )
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_conformal(seed):
    pdf = _conf_panel(seed)
    want = _conf_ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({"lineitem": pdf}, QUERIES["ml_conformal_threshold"].oracle)
        return
    got = _duck({"lineitem": pdf}, QUERIES["ml_conformal_threshold"].oracle)
    assert got.to_dict("records") == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_conformal_spark(spark, tmp_path, seed):
    pdf = _conf_panel(seed)
    want = _conf_ref(pdf)
    df = _spark_run(
        spark, tmp_path, seed, "ml_conformal_threshold", {"lineitem": pdf},
        {"lineitem": "l_orderkey long, l_quantity double,"
                     " l_extendedprice double"},
    )
    if isinstance(want, str):
        with pytest.raises(Exception, match=want):
            df.collect()
    else:
        assert [r.asDict() for r in df.collect()] == want


# ---------------------------------------------------------------------------
# ml_bootstrap_ci (derandomized md5 draws — reference uses hashlib)
# ---------------------------------------------------------------------------

_B = 20
_POIS_T = [
    1580030169, 3160060337, 3950075422, 4213413783, 4279248374,
    4292415292, 4294609778, 4294923276, 4294962463,
]


def _boot_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(66_000 + seed)
    n = rng.randint(1, 500) if seed % 10 else 2_000
    rows = [
        (rng.randrange(10**9), rng.randint(0, 500_000) / 100)
        for _ in range(n)
    ]
    return pd.DataFrame(rows, columns=["o_orderkey", "o_totalprice"])


def _boot_ref(pdf: pd.DataFrame) -> dict:
    base = [
        (int(k), 1 if tp >= 250_000 else 0)
        for k, tp in zip(pdf["o_orderkey"], pdf["o_totalprice"])
    ]
    accs = []
    for b in range(_B):
        sw = swy = 0
        for k, y in base:
            h = int(
                hashlib.md5(f"boot{b}_{k}".encode()).hexdigest()[:8], 16
            )
            w = bisect_right(_POIS_T, h)
            sw += w
            swy += w * y
        accs.append(((swy * 1_000_000) // max(sw, 1), b))
    ordered = sorted(accs)
    n = len(base)
    return {
        "n": n,
        "point_acc_x1e6": (sum(y for _, y in base) * 1_000_000) // n,
        "boot_mean_x1e6": sum(a for a, _ in accs) // _B,
        "ci_lo_x1e6": ordered[1][0],
        "ci_hi_x1e6": ordered[_B - 2][0],
        "n_replicas": _B,
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_bootstrap(seed):
    pdf = _boot_panel(seed)
    got = _duck({"orders": pdf}, QUERIES["ml_bootstrap_ci"].oracle)
    assert got.iloc[0].to_dict() == _boot_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_bootstrap_spark(spark, tmp_path, seed):
    pdf = _boot_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "ml_bootstrap_ci", {"orders": pdf},
        {"orders": "o_orderkey long, o_totalprice double"},
    )
    assert df.first().asDict() == _boot_ref(pdf)

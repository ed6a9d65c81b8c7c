"""Round-10 differential fuzzing, part 3: the round-8 eval family —
unbiased pass@k (exact binomial-ratio combinatorics), the calibration
reliability table + ECE, the Murphy Brier decomposition, two-iteration
Bradley-Terry MM strengths, and Cohen's kappa (with its new named
pe = 1 guard). Same harness as parts 1-2: ~100 seeded panels per
operator against pure-Python exact references via the DuckDB oracle,
3 seeds per operator through the Spark builder."""

from __future__ import annotations

import os
import random
from collections import defaultdict

import duckdb
import pandas as pd
import pytest

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES
from tests.test_fuzz_stats_r10 import SPARK_SEEDS, _duck, _spark_run, tdiv
from tests.test_fuzz_stats_r10b import _events_panel, _matches

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
# ml_pass_at_k
# ---------------------------------------------------------------------------

_KS = (1, 2, 5)


def _pass_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(71_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    rows = []
    for _ in range(n):
        pk = rng.randrange(10**7)
        if shape == 0:
            q = 50.0  # every sample succeeds -> pass@k = 1e6 everywhere
        elif shape == 1:
            q = 1.0  # every sample fails
        else:
            q = float(rng.randint(0, 50))
        rows.append((pk, q))
    if shape == 2:
        rows = rows[:3]  # so few samples that k=5 (often k=2) rows vanish
    return pd.DataFrame(rows, columns=["l_partkey", "l_quantity"])


def _pass_ref(pdf: pd.DataFrame) -> list[dict]:
    per: dict[int, list[int]] = {}
    for pk, q in zip(pdf["l_partkey"], pdf["l_quantity"]):
        c = per.setdefault(pk % 97, [0, 0])
        c[0] += 1
        c[1] += 1 if q >= 25 else 0
    rows = []
    for k in _KS:
        vals = []
        for n, c in per.values():
            if n < k:
                continue
            if n - c < k:
                vals.append(1_000_000)
            else:
                num = den = 1
                for i in range(k):
                    num *= n - c - i
                    den *= n - i
                vals.append(1_000_000 - (num * 1_000_000) // den)
        if vals:
            rows.append(
                {"k": k, "n_tasks": len(vals),
                 "mean_pass_x1e6": sum(vals) // len(vals),
                 "min_pass_x1e6": min(vals), "max_pass_x1e6": max(vals)}
            )
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pass_at_k(seed):
    pdf = _pass_panel(seed)
    got = _duck({"lineitem": pdf}, QUERIES["ml_pass_at_k"].oracle)
    assert got.to_dict("records") == _pass_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_pass_at_k_spark(spark, tmp_path, seed):
    pdf = _pass_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "ml_pass_at_k", {"lineitem": pdf},
        {"lineitem": "l_partkey long, l_quantity double"},
    )
    assert [r.asDict() for r in df.collect()] == _pass_ref(pdf)


# ---------------------------------------------------------------------------
# ml_calibration_bins + ml_brier_decomposition (shared scored panel)
# ---------------------------------------------------------------------------


def _cal_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(72_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    rows = []
    for _ in range(n):
        q = 25.0 if shape == 0 else float(rng.randint(0, 60))
        price = float(rng.randint(0, 60_000))
        rows.append((q, price))
    return pd.DataFrame(rows, columns=["l_quantity", "l_extendedprice"])


def _bins(pdf: pd.DataFrame) -> dict[int, list[int]]:
    per: dict[int, list[int]] = {}
    for q, pr in zip(pdf["l_quantity"], pdf["l_extendedprice"]):
        conf = min(1_000_000, max(0, int(q) * 20_000))
        b = min(9, conf // 100_000)
        c = per.setdefault(b, [0, 0, 0])
        c[0] += 1
        c[1] += conf
        c[2] += 1 if pr >= 30_000 else 0
    return per


def _cal_ref(pdf: pd.DataFrame) -> list[dict]:
    per = _bins(pdf)
    rows = []
    for b in sorted(per):
        n, sum_conf, n_pos = per[b]
        mean_conf = sum_conf // n
        acc = (n_pos * 1_000_000) // n
        rows.append(
            {"bin": b, "n": n, "mean_conf_x1e6": mean_conf,
             "acc_x1e6": acc, "gap_x1e6": abs(mean_conf - acc)}
        )
    ece = sum(r["n"] * r["gap_x1e6"] for r in rows) // sum(
        r["n"] for r in rows
    )
    for r in rows:
        r["ece_x1e6"] = ece
    return rows


def _brier_ref(pdf: pd.DataFrame) -> dict:
    per = _bins(pdf)
    n_total = sum(c[0] for c in per.values())
    n_pos = sum(c[2] for c in per.values())
    sq = 0
    for q, pr in zip(pdf["l_quantity"], pdf["l_extendedprice"]):
        conf = min(1_000_000, max(0, int(q) * 20_000))
        y = 1 if pr >= 30_000 else 0
        sq += (conf - y * 1_000_000) ** 2
    base = (n_pos * 1_000_000) // n_total
    rel = res = 0
    for n, sum_conf, npos in per.values():
        conf_k = sum_conf // n
        acc_k = (npos * 1_000_000) // n
        rel += n * (conf_k - acc_k) ** 2
        res += n * (acc_k - base) ** 2
    return {
        "brier_x1e12": sq // n_total,
        "reliability_x1e12": rel // n_total,
        "resolution_x1e12": res // n_total,
        "uncertainty_x1e12": base * (1_000_000 - base),
        "base_x1e6": base,
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_calibration_bins(seed):
    pdf = _cal_panel(seed)
    got = _duck({"lineitem": pdf}, QUERIES["ml_calibration_bins"].oracle)
    assert got.to_dict("records") == _cal_ref(pdf)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_brier_decomposition(seed):
    pdf = _cal_panel(seed)
    got = _duck({"lineitem": pdf}, QUERIES["ml_brier_decomposition"].oracle)
    assert got.iloc[0].to_dict() == _brier_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_calibration_and_brier_spark(spark, tmp_path, seed):
    pdf = _cal_panel(seed)
    schemas = {"lineitem": "l_quantity double, l_extendedprice double"}
    c = _spark_run(
        spark, tmp_path, seed, "ml_calibration_bins", {"lineitem": pdf},
        schemas,
    )
    assert [r.asDict() for r in c.collect()] == _cal_ref(pdf)
    b = _spark_run(
        spark, tmp_path, 100 + seed, "ml_brier_decomposition",
        {"lineitem": pdf}, schemas,
    )
    assert b.first().asDict() == _brier_ref(pdf)


# ---------------------------------------------------------------------------
# ml_bt_strength (same match stream as ml_winrate_wilson)
# ---------------------------------------------------------------------------


def _bt_ref(pdf: pd.DataFrame) -> list[dict]:
    pairs: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for winner, loser in _matches(pdf):
        t_a, t_b = sorted((winner, loser))
        c = pairs[(t_a, t_b)]
        c[0] += 1
        c[1] += 1 if winner < loser else 0
    sided: list[tuple] = []
    for (t_a, t_b), (n, w) in pairs.items():
        sided.append((t_a, t_b, n, w))
        sided.append((t_b, t_a, n, n - w))
    w_total: dict[str, int] = defaultdict(int)
    games: dict[str, int] = defaultdict(int)
    s1: dict[str, int] = defaultdict(int)
    for t, _, n, w in sided:
        w_total[t] += w
        games[t] += n
        s1[t] += (n * 10**12) // 2_000_000
    w1 = {t: max(1, (w_total[t] * 10**12) // s1[t]) for t in s1}
    s2: dict[str, int] = defaultdict(int)
    for t, opp, n, _ in sided:
        s2[t] += (n * 10**12) // (w1[t] + w1[opp])
    return [
        {"event_type": t, "wins": w_total[t], "games": games[t],
         "w1_x1e6": w1[t], "w2_x1e6": (w_total[t] * 10**12) // s2[t]}
        for t in sorted(w_total)
    ]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_bt_strength(seed):
    pdf = _events_panel(seed)
    got = _duck({"events": pdf}, QUERIES["ml_bt_strength"].oracle)
    assert got.to_dict("records") == _bt_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_bt_strength_spark(spark, tmp_path, seed):
    pdf = _events_panel(seed)
    df = _spark_run(
        spark, tmp_path, 200 + seed, "ml_bt_strength", {"events": pdf},
        {"events": "user_id long, event_id long, event_type string,"
                   " value double"},
    )
    assert [r.asDict() for r in df.collect()] == _bt_ref(pdf)


# ---------------------------------------------------------------------------
# ml_cohens_kappa (incl. the new named pe = 1 guard)
# ---------------------------------------------------------------------------


def _kappa_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(73_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    rows = []
    for _ in range(n):
        if shape == 0:
            q, disc = 50.0, 0.08  # all (1,1): pe = 1 -> named raise
        elif shape == 1:
            q, disc = 1.0, 0.01  # all (0,0): pe = 1 -> named raise
        else:
            q = float(rng.randint(0, 50))
            disc = rng.randint(0, 10) / 100
        rows.append((q, disc))
    return pd.DataFrame(rows, columns=["l_quantity", "l_discount"])


def _kappa_ref(pdf: pd.DataFrame):
    a = (pdf["l_quantity"] > 25).astype(int)
    b = (pdf["l_discount"] >= 0.05).astype(int)
    n = len(pdf)
    n11 = int((a & b).sum())
    n10 = int((a & (1 - b)).sum())
    n01 = int(((1 - a) & b).sum())
    n00 = int(((1 - a) & (1 - b)).sum())
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    if n * n - pe_num == 0:
        return "kappa undefined"
    return {
        "n": n, "n11": n11, "n10": n10, "n01": n01, "n00": n00,
        "kappa_x1e6": tdiv(
            (n * (n11 + n00) - pe_num) * 1_000_000, n * n - pe_num
        ),
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_cohens_kappa(seed):
    pdf = _kappa_panel(seed)
    want = _kappa_ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({"lineitem": pdf}, QUERIES["ml_cohens_kappa"].oracle)
        return
    got = _duck({"lineitem": pdf}, QUERIES["ml_cohens_kappa"].oracle)
    assert got.iloc[0].to_dict() == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_cohens_kappa_spark(spark, tmp_path, seed):
    pdf = _kappa_panel(seed)
    want = _kappa_ref(pdf)
    df = _spark_run(
        spark, tmp_path, seed, "ml_cohens_kappa", {"lineitem": pdf},
        {"lineitem": "l_quantity double, l_discount double"},
    )
    if isinstance(want, str):
        with pytest.raises(Exception, match=want):
            df.collect()
    else:
        assert df.first().asDict() == want

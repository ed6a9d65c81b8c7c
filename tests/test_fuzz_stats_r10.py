"""Round-10 seeded differential fuzzing for the fixed-point stats
family (VERDICT r9 #5): the staged trunc-division identities in
DeLong, Fleiss, ANOVA/deff, MDE, TOST, and isotonic-PAV run on ~100
random panel shapes per operator (sizes 2..10k, degenerate mixes)
against independent pure-Python references, asserting EXACT x1e6
equality — or an identical named raise. This is where a one-ulp
staging bug would hide: the fixed harness panels exercise one shape;
the sweep exercises the arithmetic across the input space.

Harness design: every seeded panel runs through the registered DuckDB
oracle (in-process, milliseconds — the engine text the driver's t2
gate certifies Spark against at sf0.01 and the five-panel sweeps
re-certify at scale/skew); a per-operator subset of seeds ALSO runs
the Spark builder on tmp parquet, keeping the Spark-engine link live
on random shapes without 600 JVM jobs. Seeds are committed constants.

House conventions verified: sign-split trunc division (both engines
truncate toward zero; Python // floors), round-half-away-from-zero,
IEEE-correctly-rounded sqrt on exact-int inputs < 2^53.
"""

from __future__ import annotations

import math
import os
import random

import duckdb
import pandas as pd
import pytest

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES

get_queries()  # populate the registry for direct QUERIES access

# Driver-budget gating (round 12, VERDICT r11 item 5): the full fuzz
# panels (~4,500 parametrized cases across the r10/r11 files) pushed
# the default pytest run past the driver wall budget (VERIFY_r11
# tests_ok=false, tail cut at 81%). Default = the seeded first 12
# cases per panel (deterministic, still covers the generator shape
# classes); P6_FUZZ_FULL=1 restores the full sweep — run it in build
# rounds / before changing any covered operator.
SEEDS = list(range(100 if os.environ.get("P6_FUZZ_FULL") == "1" else 12))
SPARK_SEEDS = [0, 1, 7]  # per-operator subset that also drives the JVM


def tdiv(a: int, b: int) -> int:
    """Truncating integer division (both engines' semantics)."""
    sign = -1 if (a < 0) != (b < 0) else 1
    return sign * (abs(a) // abs(b))


def rha(x: float) -> int:
    """round-half-away-from-zero on a float (Spark round / DuckDB
    round semantics; Python's round() is banker's)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _duck(pdf_by_table: dict[str, pd.DataFrame], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t, pdf in pdf_by_table.items():
            con.register(t, pdf)
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _spark_run(spark, tmp_path, seed, name, pdf_by_table, schemas):
    sf_dir = str(tmp_path / f"{name}_{seed}")
    os.makedirs(sf_dir, exist_ok=True)
    for t, pdf in pdf_by_table.items():
        spark.createDataFrame(pdf, schemas[t]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(sf_dir, f"{t}.parquet"))
    return get_queries()[name](spark, sf_dir)


# ---------------------------------------------------------------------------
# ml_tost_equivalence
# ---------------------------------------------------------------------------

_Z95 = 1_644_854


def _tost_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(11_000 + seed)
    shape = seed % 10
    na = 2 if shape == 0 else rng.randint(2, 10_000)
    nb = 2 if shape == 1 else rng.randint(2, 10_000)
    lo, hi = sorted((rng.randint(0, 64_000), rng.randint(0, 64_000)))
    hi = max(hi, lo + 2)

    def vals(n):
        # k/64 is binary-exact, so round(value * 1e6) is unambiguous
        return [rng.randint(lo, hi) / 64 for _ in range(n)]

    rows = (
        [("click", v) for v in vals(na)]
        + [("purchase", v) for v in vals(nb)]
        + [("view", 9.5)] * (seed % 3)  # filtered-out noise
    )
    return pd.DataFrame(rows, columns=["event_type", "value"])


def _tost_ref(pdf: pd.DataFrame):
    """Expected output row, or the expected error substring."""
    arms: dict[int, list[int]] = {1: [], 0: []}
    for et, v in zip(pdf["event_type"], pdf["value"]):
        if et in ("click", "purchase"):
            arms[1 if et == "click" else 0].append(rha(v * 1_000_000))
    n_a, n_b = len(arms[1]), len(arms[0])
    if n_a < 2 or n_b < 2:
        return "need >= 2 samples per arm"
    s_a, s_b = sum(arms[1]), sum(arms[0])
    ssq_a = sum(v * v for v in arms[1])
    ssq_b = sum(v * v for v in arms[0])
    mean_a, mean_b = tdiv(s_a, n_a), tdiv(s_b, n_b)
    var_a = tdiv(n_a * ssq_a - s_a * s_a, n_a * (n_a - 1))
    var_b = tdiv(n_b * ssq_b - s_b * s_b, n_b * (n_b - 1))
    pooled = tdiv(s_a + s_b, n_a + n_b)
    delta = tdiv(pooled * 5, 100)
    se2 = tdiv(var_a, n_a) + tdiv(var_b, n_b)
    if se2 == 0:
        return "zero-variance"
    zl = rha((mean_a - mean_b + delta) * 1_000_000.0 / math.sqrt(se2))
    zu = rha((mean_a - mean_b - delta) * 1_000_000.0 / math.sqrt(se2))
    verdict = "equivalent" if (zl >= _Z95 and zu <= -_Z95) else "not_equivalent"
    return {
        "n_a": n_a, "n_b": n_b, "mean_a_x1e6": mean_a, "mean_b_x1e6": mean_b,
        "delta_x1e6": delta, "se2": se2, "z_lower_x1e6": zl,
        "z_upper_x1e6": zu, "verdict": verdict,
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tost(seed):
    pdf = _tost_panel(seed)
    want = _tost_ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({"events": pdf}, QUERIES["ml_tost_equivalence"].oracle)
        return
    got = _duck({"events": pdf}, QUERIES["ml_tost_equivalence"].oracle)
    assert got.iloc[0].to_dict() == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_tost_spark(spark, tmp_path, seed):
    pdf = _tost_panel(seed)
    want = _tost_ref(pdf)
    df = _spark_run(
        spark, tmp_path, seed, "ml_tost_equivalence", {"events": pdf},
        {"events": "event_type string, value double"},
    )
    if isinstance(want, str):
        with pytest.raises(Exception, match=want):
            df.collect()
    else:
        assert df.first().asDict() == want


# ---------------------------------------------------------------------------
# ml_auc_delong
# ---------------------------------------------------------------------------


def _delong_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(22_000 + seed)
    shape = seed % 10
    n = rng.randint(4, 10_000)
    spread = rng.choice([10, 100, 5000])  # small spread forces heavy ties
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    for _ in range(n):
        cents = rng.randint(100, 100 + spread)
        if shape == 0:
            p = prios[0]  # all positive -> n0 = 0 -> raise
        elif shape == 1:
            p = prios[4]  # all negative -> n1 = 0 -> raise
        else:
            p = rng.choice(prios)
        rows.append((cents / 100, p))
    return pd.DataFrame(rows, columns=["o_totalprice", "o_orderpriority"])


def _delong_ref(pdf: pd.DataFrame):
    from collections import Counter

    per: dict[int, list[int]] = {}
    for tp, pr in zip(pdf["o_totalprice"], pdf["o_orderpriority"]):
        v = rha(tp * 100)
        y = 1 if pr in ("1-URGENT", "2-HIGH") else 0
        c = per.setdefault(v, [0, 0])
        c[0] += 1
        c[1] += y
    n1 = sum(c1 for _, c1 in per.values())
    n0 = sum(c - c1 for c, c1 in per.values())
    if n1 <= 1 or n0 <= 1:
        return "need >= 2"
    neg_prior = pos_prior = 0
    asum = ss1 = ss0 = 0
    for v in sorted(per):
        cnt, cnt1 = per[v]
        cnt0 = cnt - cnt1
        a = 2 * neg_prior + cnt0
        b = 2 * (n1 - pos_prior - cnt1) + cnt1
        asum += cnt1 * a
        ss1 += cnt1 * a * a
        ss0 += cnt0 * b * b
        neg_prior += cnt0
        pos_prior += cnt1
    auc = (asum * 1_000_000) // (2 * n1 * n0)
    var10 = tdiv(
        tdiv(n1 * ss1 - asum * asum, 4 * n0 * n0) * 10**12,
        n1 * n1 * (n1 - 1),
    )
    var01 = tdiv(
        tdiv(n0 * ss0 - asum * asum, 4 * n1 * n1) * 10**12,
        n0 * n0 * (n0 - 1),
    )
    se = rha(math.sqrt(var10 + var01))
    z = 0 if se == 0 else tdiv((auc - 500_000) * 1_000_000, se)
    return {
        "n1": n1, "n0": n0, "auc_x1e6": auc, "var10_x1e12": var10,
        "var01_x1e12": var01, "var_x1e12": var10 + var01,
        "se_x1e6": se, "z_vs_half_x1e6": z,
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_delong(seed):
    pdf = _delong_panel(seed)
    want = _delong_ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({"orders": pdf}, QUERIES["ml_auc_delong"].oracle)
        return
    got = _duck({"orders": pdf}, QUERIES["ml_auc_delong"].oracle)
    assert got.iloc[0].to_dict() == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_delong_spark(spark, tmp_path, seed):
    pdf = _delong_panel(seed)
    want = _delong_ref(pdf)
    df = _spark_run(
        spark, tmp_path, seed, "ml_auc_delong", {"orders": pdf},
        {"orders": "o_totalprice double, o_orderpriority string"},
    )
    if isinstance(want, str):
        with pytest.raises(Exception, match=want):
            df.collect()
    else:
        assert df.first().asDict() == want


# ---------------------------------------------------------------------------
# ml_fleiss_kappa
# ---------------------------------------------------------------------------


def _fleiss_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(33_000 + seed)
    shape = seed % 10
    n_items = rng.randint(1, 3000)
    rows = []
    for item in range(n_items):
        n_lines = 3 if shape == 0 else rng.randint(1, 5)
        for ln in range(1, n_lines + 1):
            if shape == 1:
                q = 5.0  # every rating 'low' -> kden = 0 edge
            else:
                q = float(rng.randint(1, 50))
            rows.append((item, ln, q))
    return pd.DataFrame(
        rows, columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )


def _fleiss_ref(pdf: pd.DataFrame):
    from collections import Counter

    by_item: dict[int, list[str]] = {}
    counts = Counter(zip(pdf["l_orderkey"], pdf["l_linenumber"]))
    for k, ln, q in zip(
        pdf["l_orderkey"], pdf["l_linenumber"], pdf["l_quantity"]
    ):
        if ln <= 3:
            cat = "low" if q < 17 else ("mid" if q < 34 else "high")
            by_item.setdefault(k, []).append(cat)
    items = {k: v for k, v in by_item.items() if len(v) == 3}
    n_items = len(items)
    s2 = 0
    col = Counter()
    for cats in items.values():
        cell = Counter(cats)
        s2 += sum(c * c for c in cell.values())
        col.update(cell)
    c2 = sum(c * c for c in col.values())
    knum = 3 * n_items * (s2 - 3 * n_items) - 2 * c2
    kden = 2 * (9 * n_items * n_items - c2)
    if n_items == 0:
        return None  # zero-row oracle output (no items with 3 raters)
    return {
        "n_items": n_items, "s2": s2, "c2": c2,
        "pbar_x1e6": ((s2 - 3 * n_items) * 1_000_000) // (6 * n_items),
        "pe_x1e6": (c2 * 1_000_000) // (9 * n_items * n_items),
        "kappa_x1e6": 0 if kden == 0 else tdiv(knum * 1_000_000, kden),
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_fleiss(seed):
    pdf = _fleiss_panel(seed)
    want = _fleiss_ref(pdf)
    got = _duck({"lineitem": pdf}, QUERIES["ml_fleiss_kappa"].oracle)
    if want is None:
        pytest.skip("panel has no 3-rater items")
    assert got.iloc[0].to_dict() == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_fleiss_spark(spark, tmp_path, seed):
    pdf = _fleiss_panel(seed)
    want = _fleiss_ref(pdf)
    df = _spark_run(
        spark, tmp_path, seed, "ml_fleiss_kappa", {"lineitem": pdf},
        {"lineitem": "l_orderkey long, l_linenumber int, l_quantity double"},
    )
    if want is not None:
        assert df.first().asDict() == want


# ---------------------------------------------------------------------------
# ml_design_effect + ml_mde_power (shared deff chain)
# ---------------------------------------------------------------------------


def _deff_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(44_000 + seed)
    shape = seed % 10
    if shape == 0:
        k = 1  # k < 2 -> raise
    elif shape == 1:
        k = rng.randint(2, 50)  # all singletons below -> n <= k -> raise
    else:
        k = rng.randint(2, 1500)
    rows = []
    for c in range(k):
        m = 1 if shape == 1 else rng.randint(1, 12)
        base = rng.randint(100, 100_000)
        for _ in range(m):
            cents = base + rng.randint(0, 5_000)
            rows.append((c, cents / 100))
    return pd.DataFrame(rows, columns=["o_custkey", "o_totalprice"])


def _deff_ref(pdf: pd.DataFrame):
    per: dict[int, list[int]] = {}
    for c, tp in zip(pdf["o_custkey"], pdf["o_totalprice"]):
        per.setdefault(c, []).append(rha(tp * 100))
    k = len(per)
    n = sum(len(v) for v in per.values())
    if k < 2 or n <= k:
        return "need >= 2 clusters"
    s = sum(sum(v) for v in per.values())
    ssq = sum(y * y for v in per.values() for y in v)
    ssb_part = sum(tdiv(sum(v) * sum(v), len(v)) for v in per.values())
    sum_nj2 = sum(len(v) ** 2 for v in per.values())
    msb = tdiv(n * ssb_part - s * s, (k - 1) * n)
    msw = tdiv(ssq - ssb_part, n - k)
    n0 = tdiv((n - tdiv(sum_nj2, n)) * 1_000_000, k - 1)
    mbar = tdiv(n * 1_000_000, k)
    icc = tdiv(
        (msb - msw) * 10**12, msb * 10**6 + (n0 - 10**6) * msw
    )
    deff = 10**6 + tdiv((mbar - 10**6) * icc, 10**6)
    return {
        "k": k, "n": n, "msb": msb, "msw": msw, "n0_x1e6": n0,
        "mbar_x1e6": mbar, "icc_x1e6": icc, "deff_x1e6": deff,
        # carried for the MDE reference
        "_s": s, "_ssq": ssq,
    }


_Z_ALPHA = 1_959_964
_POWERS = [(80, 841_621), (90, 1_281_552)]


def _mde_ref(pdf: pd.DataFrame):
    d = _deff_ref(pdf)
    if isinstance(d, str):
        return d
    n, s, ssq = d["n"], d["_s"], d["_ssq"]
    var_c2 = tdiv(n * ssq - s * s, n * (n - 1))
    n_arm = n // 2
    mean_cents = s // n
    rows = []
    for p, zp in _POWERS:
        arg_srs = (2 * var_c2) // n_arm
        arg_deff = (2 * var_c2 * d["deff_x1e6"]) // (n_arm * 1_000_000)
        mde = rha(((_Z_ALPHA + zp) / 1_000_000.0) * math.sqrt(arg_srs))
        mde_d = rha(((_Z_ALPHA + zp) / 1_000_000.0) * math.sqrt(arg_deff))
        rows.append(
            {
                "power_x100": p, "n_arm": n_arm, "mean_cents": mean_cents,
                "var_c2": var_c2, "deff_x1e6": d["deff_x1e6"],
                "mde_cents": mde, "mde_deff_cents": mde_d,
                "mde_rel_x1e6": (mde * 1_000_000) // mean_cents,
                "mde_deff_rel_x1e6": (mde_d * 1_000_000) // mean_cents,
            }
        )
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_design_effect(seed):
    pdf = _deff_panel(seed)
    want = _deff_ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({"orders": pdf}, QUERIES["ml_design_effect"].oracle)
        return
    got = _duck({"orders": pdf}, QUERIES["ml_design_effect"].oracle)
    want = {c: v for c, v in want.items() if not c.startswith("_")}
    assert got.iloc[0].to_dict() == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_mde_power(seed):
    pdf = _deff_panel(seed)
    want = _mde_ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({"orders": pdf}, QUERIES["ml_mde_power"].oracle)
        return
    got = _duck({"orders": pdf}, QUERIES["ml_mde_power"].oracle)
    assert [r for r in got.to_dict("records")] == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_deff_and_mde_spark(spark, tmp_path, seed):
    pdf = _deff_panel(seed)
    schemas = {"orders": "o_custkey long, o_totalprice double"}
    d = _spark_run(
        spark, tmp_path, seed, "ml_design_effect", {"orders": pdf}, schemas
    )
    m = _spark_run(
        spark, tmp_path, 1000 + seed, "ml_mde_power", {"orders": pdf}, schemas
    )
    want_d = _deff_ref(pdf)
    want_m = _mde_ref(pdf)
    if isinstance(want_d, str):
        with pytest.raises(Exception, match=want_d):
            d.collect()
        with pytest.raises(Exception, match=want_d):
            m.collect()
        return
    want_d = {c: v for c, v in want_d.items() if not c.startswith("_")}
    assert d.first().asDict() == want_d
    assert [r.asDict() for r in m.collect()] == want_m


# ---------------------------------------------------------------------------
# ml_isotonic_calibration
# ---------------------------------------------------------------------------


def _iso_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(55_000 + seed)
    shape = seed % 10
    n = rng.randint(2, 10_000)
    rows = []
    for _ in range(n):
        if shape == 0:
            q = float(rng.choice([3, 17]))  # two bins only
        else:
            q = float(rng.randint(0, 60))  # conf clamps past 50
        price = float(rng.randint(0, 60_000))
        rows.append((q, price))
    return pd.DataFrame(rows, columns=["l_quantity", "l_extendedprice"])


def _iso_ref(pdf: pd.DataFrame):
    per: dict[int, list[int]] = {}
    for q, pr in zip(pdf["l_quantity"], pdf["l_extendedprice"]):
        conf = min(1_000_000, max(0, int(q) * 20_000))
        b = min(9, conf // 100_000)
        c = per.setdefault(b, [0, 0, 0])
        c[0] += 1
        c[1] += conf
        c[2] += 1 if pr >= 30_000 else 0
    bins = sorted(per)
    # interval positive rates over present-bin index ranges via cums
    rate = {}
    for ji, j in enumerate(bins):
        cn = cp = 0
        for k in bins[ji:]:
            cn += per[k][0]
            cp += per[k][2]
            rate[(j, k)] = (cp * 1_000_000) // cn
    out = []
    for b in bins:
        iso = max(
            min(
                rate[(j, k)]
                for j2, k in rate
                if j2 == j and j <= b <= k
            )
            for j in bins
            if j <= b
        )
        n, sum_conf, n_pos = per[b]
        out.append(
            {
                "bin": b, "n": n, "mean_conf_x1e6": sum_conf // n,
                "acc_x1e6": (n_pos * 1_000_000) // n, "iso_x1e6": iso,
            }
        )
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_isotonic(seed):
    pdf = _iso_panel(seed)
    want = _iso_ref(pdf)
    got = _duck(
        {"lineitem": pdf}, QUERIES["ml_isotonic_calibration"].oracle
    ).to_dict("records")
    assert got == want
    # and the fitted map is monotone (the PAV property)
    isos = [r["iso_x1e6"] for r in want]
    assert isos == sorted(isos)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_isotonic_spark(spark, tmp_path, seed):
    pdf = _iso_panel(seed)
    want = _iso_ref(pdf)
    df = _spark_run(
        spark, tmp_path, seed, "ml_isotonic_calibration", {"lineitem": pdf},
        {"lineitem": "l_quantity double, l_extendedprice double"},
    )
    assert [r.asDict() for r in df.collect()] == want

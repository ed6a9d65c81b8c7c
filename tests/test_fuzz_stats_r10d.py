"""Round-10 differential fuzzing, part 4: the earlier-round hypothesis-
test / inequality family — Welch t^2, Mann-Whitney U (tie-doubled
ranks), chi-square independence, two-sample KS, and the Gini rank
formula. Same harness as parts 1-3.

This sweep CAUGHT a real divergence class on its first run: on
degenerate panels (empty/singleton arm, zero variance, zero revenue
mass) these four queries divide by zero, and DuckDB ``//`` yields NULL
SILENTLY while Spark ANSI div raises — so the two engines drifted on
exactly the panels the harness corpus never exercises. All four now
carry named guards (the r9b loud-failure discipline) raising the SAME
message on both engines, which this module pins."""

from __future__ import annotations

import os
import random
from collections import Counter, defaultdict

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

RAISES = {
    "q_welch_ttest": "q_welch_ttest",
    "q_mannwhitney_u": "q_mannwhitney_u: empty group",
    "q_ks_two_sample": "q_ks_two_sample: empty side",
    "q_gini_concentration": "zero revenue mass",
}


# ---------------------------------------------------------------------------
# q_welch_ttest
# ---------------------------------------------------------------------------


def _welch_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(81_000 + seed)
    shape = seed % 10
    rows = []
    n1 = 1 if shape == 0 else rng.randint(2, 8_000)
    n2 = 0 if shape == 1 else rng.randint(2, 8_000)
    for _ in range(n1):
        q = 30.0 if shape == 2 else float(rng.randint(1, 50))
        rows.append(("O", q))
    for _ in range(n2):
        q = 30.0 if shape == 2 else float(rng.randint(1, 50))
        rows.append(("F", q))
    rows += [("X", 7.0)] * (seed % 3)  # ignored third status
    return pd.DataFrame(rows, columns=["l_linestatus", "l_quantity"])


def _welch_ref(pdf: pd.DataFrame):
    g = {"O": [0, 0, 0], "F": [0, 0, 0]}
    for st, q in zip(pdf["l_linestatus"], pdf["l_quantity"]):
        if st in g:
            v = int(q)
            g[st][0] += 1
            g[st][1] += v
            g[st][2] += v * v
    (n1, s1, ss1), (n2, s2, ss2) = g["O"], g["F"]
    if n1 < 2 or n2 < 2:
        return RAISES["q_welch_ttest"]
    diff = s1 * n2 - s2 * n1
    a1 = n1 * ss1 - s1 * s1
    a2 = n2 * ss2 - s2 * s2
    md = tdiv(diff * 10**9, n1 * n2)
    se2 = tdiv(a1 * 10**12, n1 * n1 * (n1 - 1)) + tdiv(
        a2 * 10**12, n2 * n2 * (n2 - 1)
    )
    if se2 == 0:
        return RAISES["q_welch_ttest"]
    return {
        "n1": n1, "n2": n2, "mean_diff_x1e4": tdiv(md, 100_000),
        "t2_x1e6": tdiv(md * md, se2),
    }


# ---------------------------------------------------------------------------
# q_mannwhitney_u (events: click vs purchase, x1e6 values)
# ---------------------------------------------------------------------------


def _mw_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(82_000 + seed)
    shape = seed % 10
    rows = []
    na = 0 if shape == 0 else rng.randint(1, 8_000)
    nb = 0 if shape == 1 else rng.randint(1, 8_000)
    spread = rng.choice([4, 64, 4096])  # small spread -> heavy ties
    for _ in range(na):
        rows.append(("click", rng.randint(0, spread) / 64))
    for _ in range(nb):
        rows.append(("purchase", rng.randint(0, spread) / 64))
    rows += [("view", 1.5)] * (seed % 3)
    return pd.DataFrame(rows, columns=["event_type", "value"])


def _mw_ref(pdf: pd.DataFrame):
    per: dict[int, list[int]] = {}
    for et, v in zip(pdf["event_type"], pdf["value"]):
        if et in ("click", "purchase"):
            c = per.setdefault(rha(v * 1_000_000), [0, 0])
            c[0] += 1
            c[1] += 1 if et == "click" else 0
    n = sum(c for c, _ in per.values())
    na = sum(ca for _, ca in per.values())
    nb = n - na
    if na == 0 or nb == 0:
        return RAISES["q_mannwhitney_u"]
    prior = 0
    ranksum = 0
    for v in sorted(per):
        cnt, cnt_a = per[v]
        ranksum += cnt_a * (2 * prior + cnt + 1)
        prior += cnt
    u2 = ranksum - na * (na + 1)
    return {
        "na": na, "nb": nb, "ranksum_a_x2": ranksum, "u_a_x2": u2,
        "auc_x1e6": (u2 * 1_000_000) // (2 * na * nb),
    }


# ---------------------------------------------------------------------------
# q_chisq_independence (orders: priority x status)
# ---------------------------------------------------------------------------

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
_STATS = ["O", "F", "P"]


def _chisq_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(83_000 + seed)
    shape = seed % 10
    n = rng.randint(1, 10_000)
    rows = []
    for _ in range(n):
        if shape == 0:
            rows.append((_PRIOS[0], _STATS[0]))  # single cell: term = 0
        else:
            rows.append((rng.choice(_PRIOS), rng.choice(_STATS)))
    return pd.DataFrame(rows, columns=["o_orderpriority", "o_orderstatus"])


def _chisq_ref(pdf: pd.DataFrame) -> list[dict]:
    cells = Counter(zip(pdf["o_orderpriority"], pdf["o_orderstatus"]))
    rt: dict[str, int] = defaultdict(int)
    ct: dict[str, int] = defaultdict(int)
    for (rp, cs), o in cells.items():
        rt[rp] += o
        ct[cs] += o
    n = sum(cells.values())
    rows = []
    for (rp, cs), o in sorted(cells.items()):
        num = (o * n - rt[rp] * ct[cs]) ** 2
        term = ((num // (rt[rp] * ct[cs])) * 1_000_000) // n // n
        rows.append(
            {"priority": rp, "status": cs, "observed": o,
             "expected_x100": (rt[rp] * ct[cs] * 100) // n,
             "term_x1e6": term}
        )
    chi2 = sum(r["term_x1e6"] for r in rows)
    for r in rows:
        r["chi2_total_x1e6"] = chi2
    return rows


# ---------------------------------------------------------------------------
# q_ks_two_sample (events: click vs purchase ECDF distance)
# ---------------------------------------------------------------------------


def _ks_ref(pdf: pd.DataFrame):
    per: dict[int, list[int]] = {}
    for et, v in zip(pdf["event_type"], pdf["value"]):
        if et in ("click", "purchase"):
            c = per.setdefault(rha(v * 1_000_000), [0, 0])
            c[0 if et == "click" else 1] += 1
    na = sum(a for a, _ in per.values())
    nb = sum(b for _, b in per.values())
    if na == 0 or nb == 0:
        return RAISES["q_ks_two_sample"]
    cuma = cumb = 0
    d = 0
    for v in sorted(per):
        ca, cb = per[v]
        cuma += ca
        cumb += cb
        d = max(d, abs(cuma * nb - cumb * na))
    return {
        "ks_numerator": d, "n_a": na, "n_b": nb,
        "ks_x1e6": (d * 1_000_000) // (na * nb),
    }


# ---------------------------------------------------------------------------
# q_gini_concentration (orders x customer rank formula)
# ---------------------------------------------------------------------------


def _gini_panel(seed: int):
    rng = random.Random(84_000 + seed)
    shape = seed % 10
    n_cust = rng.randint(1, 2_000)
    segs = ["BUILDING", "MACHINERY", "FURNITURE"]
    cust = pd.DataFrame(
        [(c, rng.choice(segs)) for c in range(n_cust)],
        columns=["c_custkey", "c_mktsegment"],
    )
    rows = []
    for _ in range(rng.randint(1, 8_000)):
        c = rng.randrange(n_cust)
        tp = 0.0 if shape == 0 else rng.randint(0, 10**7) / 100
        rows.append((c, tp))
    orders = pd.DataFrame(rows, columns=["o_custkey", "o_totalprice"])
    return cust, orders


def _gini_ref(cust: pd.DataFrame, orders: pd.DataFrame):
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    rev: dict[tuple, int] = defaultdict(int)
    for c, tp in zip(orders["o_custkey"], orders["o_totalprice"]):
        rev[(seg_of[c], c)] += rha(tp * 100)
    by_seg: dict[str, list[tuple]] = defaultdict(list)
    for (seg, c), r in rev.items():
        by_seg[seg].append((r, c))
    rows = []
    for seg in sorted(by_seg):
        xs = sorted(by_seg[seg])
        n = len(xs)
        t = sum(r for r, _ in xs)
        if t == 0:
            return RAISES["q_gini_concentration"]
        s = sum(i * r for i, (r, _) in enumerate(xs, start=1))
        rows.append(
            {"segment": seg, "n_customers": n, "total_rev_x100": t,
             "gini_x1e6": tdiv((2 * s - (n + 1) * t) * 1_000_000, n * t)}
        )
    return rows


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

CASES = {
    "q_welch_ttest": (
        _welch_panel, _welch_ref, "lineitem",
        "l_linestatus string, l_quantity double", "one",
    ),
    "q_mannwhitney_u": (
        _mw_panel, _mw_ref, "events",
        "event_type string, value double", "one",
    ),
    "q_chisq_independence": (
        _chisq_panel, _chisq_ref, "orders",
        "o_orderpriority string, o_orderstatus string", "many",
    ),
    "q_ks_two_sample": (
        _mw_panel, _ks_ref, "events",
        "event_type string, value double", "one",
    ),
}


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("name", sorted(CASES))
def test_fuzz_stat(name, seed):
    gen, ref, table, _, arity = CASES[name]
    pdf = gen(seed)
    want = ref(pdf)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck({table: pdf}, QUERIES[name].oracle)
        return
    got = _duck({table: pdf}, QUERIES[name].oracle)
    if arity == "one":
        assert got.iloc[0].to_dict() == want
    else:
        assert got.to_dict("records") == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
@pytest.mark.parametrize("name", sorted(CASES))
def test_fuzz_stat_spark(spark, tmp_path, name, seed):
    gen, ref, table, schema, arity = CASES[name]
    pdf = gen(seed)
    want = ref(pdf)
    df = _spark_run(spark, tmp_path, seed, name, {table: pdf}, {table: schema})
    if isinstance(want, str):
        with pytest.raises(Exception, match=want):
            df.collect()
    elif arity == "one":
        assert df.first().asDict() == want
    else:
        assert [r.asDict() for r in df.collect()] == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_gini(seed):
    cust, orders = _gini_panel(seed)
    want = _gini_ref(cust, orders)
    if isinstance(want, str):
        with pytest.raises(duckdb.Error, match=want):
            _duck(
                {"customer": cust, "orders": orders},
                QUERIES["q_gini_concentration"].oracle,
            )
        return
    got = _duck(
        {"customer": cust, "orders": orders},
        QUERIES["q_gini_concentration"].oracle,
    )
    assert got.to_dict("records") == want


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_gini_spark(spark, tmp_path, seed):
    cust, orders = _gini_panel(seed)
    want = _gini_ref(cust, orders)
    df = _spark_run(
        spark, tmp_path, seed, "q_gini_concentration",
        {"customer": cust, "orders": orders},
        {
            "customer": "c_custkey long, c_mktsegment string",
            "orders": "o_custkey long, o_totalprice double",
        },
    )
    if isinstance(want, str):
        with pytest.raises(Exception, match=want):
            df.collect()
    else:
        assert [r.asDict() for r in df.collect()] == want

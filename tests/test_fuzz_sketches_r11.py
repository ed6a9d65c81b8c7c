"""Round-11 seeded differential fuzzing for the sketch family (the
r10/r11 fuzz discipline extended to the md5-deterministic estimators):
``q_hll_registers``, ``q_hll_merge``, ``q_kmv_distinct``,
``q_kmv_setops``, and ``dd_bloom_probe`` run on 60 random panels each
against independent pure-Python references (registers, k-minimum-value
heads, and bloom bit sets re-derived from hashlib.md5), asserting
EXACT equality — registered DuckDB oracle per seed, Spark-builder
subsets on tmp parquet, committed seed constants.

What this sweeps that the fixed harness corpus cannot: key universes
crossing the KMV k=64 boundary in both directions (count path vs
(k-1)*2^32/kth estimator path), one side of the q_kmv_setops date cut
EMPTY, sources whose every text is NULL (the md5(NULL) drop arm of the
HLL merge), single-key universes, bloom member sets empty (every probe
must come back negative with zero false negatives), and negative keys.

This sweep's first run caught a REAL divergence: on a fully-empty
orders table q_kmv_setops reached `jaccard = n_both*1e6 // k_used`
with k_used = 0, where DuckDB `// 0` silently yields NULL but Spark
ANSI `div` raises a bare DIVIDE_BY_ZERO — the r10 drift class. Both
engines now raise the same named error (plans/closing_r4.py), pinned
by test_kmv_setops_empty_raises_both_engines below.

All arithmetic is integer-exact (md5-derived 32-bit hashes, x1e6
trunc-division), so any mismatch is a real engine/reference
divergence, never float noise.
"""

from __future__ import annotations

import os
import hashlib
import random

import duckdb
import pandas as pd
import pytest

from p6_spark.plans.registry import QUERIES
from tests.test_fuzz_stats_r10 import _duck, _spark_run, tdiv

# Driver-budget gating (round 12, VERDICT r11 item 5): the full fuzz
# panels (~4,500 parametrized cases across the r10/r11 files) pushed
# the default pytest run past the driver wall budget (VERIFY_r11
# tests_ok=false, tail cut at 81%). Default = the seeded first 12
# cases per panel (deterministic, still covers the generator shape
# classes); P6_FUZZ_FULL=1 restores the full sweep — run it in build
# rounds / before changing any covered operator.
SEEDS = list(range(60 if os.environ.get("P6_FUZZ_FULL") == "1" else 12))

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_ORD_SCHEMA = "o_orderkey long, o_custkey long, o_orderdate timestamp"
_LI_SCHEMA = "l_orderkey long, l_partkey long, l_suppkey long"
_CUST_SCHEMA = "c_custkey long, c_mktsegment string"

_CUT = pd.Timestamp("1998-01-01")


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# references
# ---------------------------------------------------------------------------


def _hll_summary(ws: list[int]):
    """(n_buckets_used, inv_sum_x2e25) from (bucket, w) register feed."""
    regs: dict[int, int] = {}
    for h in ws:
        bucket, w = h // 16_777_216, h % 16_777_216
        r = 25 if w == 0 else 25 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), r)
    used = sum(1 for r in regs.values() if r > 0)
    inv = sum(1 << (25 - regs.get(b, 0)) for b in range(256))
    return used, inv


_HLL_NUM = 718_273 * 256 * 256 * 33_554_432


def _hll_registers_ref(orders: pd.DataFrame) -> list[tuple]:
    keys = {int(k) for k in orders["o_custkey"]}
    used, inv = _hll_summary([_md5i(f"hll_{k}") for k in keys])
    return [(used, inv, tdiv(tdiv(_HLL_NUM, inv), 1_000_000), len(keys))]


def _hll_merge_ref(docs: pd.DataFrame) -> list[tuple]:
    k = {
        (r["source"],
         hashlib.md5(r["text"].encode()).hexdigest()
         if r["text"] is not None else None)
        for _, r in docs.iterrows()
    }
    n_sources = len({s for s, _ in k})
    hs = [(s, _md5i(f"hllm_{key}")) for s, key in k if key is not None]
    # merged (max of per-source maxes) == direct (max over all) register
    # by the HLL merge property; n_reg_diff computes both honestly
    merged_regs: dict[int, int] = {}
    for _s, h in hs:
        bucket, w = h // 16_777_216, h % 16_777_216
        r = 25 if w == 0 else 25 - w.bit_length()
        merged_regs[bucket] = max(merged_regs.get(bucket, 0), r)
    direct_regs: dict[int, int] = {}
    for h in {h for _s, h in hs}:
        bucket, w = h // 16_777_216, h % 16_777_216
        r = 25 if w == 0 else 25 - w.bit_length()
        direct_regs[bucket] = max(direct_regs.get(bucket, 0), r)
    n_diff = sum(
        1
        for b in range(256)
        if merged_regs.get(b, 0) != direct_regs.get(b, 0)
    )
    minv = sum(1 << (25 - merged_regs.get(b, 0)) for b in range(256))
    dinv = sum(1 << (25 - direct_regs.get(b, 0)) for b in range(256))
    return [(
        n_sources, n_diff, minv, dinv,
        tdiv(tdiv(_HLL_NUM, minv), 1_000_000),
        tdiv(tdiv(_HLL_NUM, dinv), 1_000_000),
    )]


def _kmv_head(keys) -> list[int]:
    return sorted({_md5i(str(int(k))) for k in keys})[:64]


def _kmv_distinct_ref(li: pd.DataFrame, orders: pd.DataFrame) -> list[tuple]:
    out = []
    for col, keys in (
        ("l_partkey", li["l_partkey"]),
        ("l_suppkey", li["l_suppkey"]),
        ("o_custkey", orders["o_custkey"]),
    ):
        head = _kmv_head(keys)
        if not head:
            continue
        k_used, kth = len(head), head[-1]
        est = k_used if k_used < 64 else tdiv(63 * 4_294_967_296, kth)
        out.append((col, k_used, kth, est))
    return sorted(out)


def _kmv_setops_ref(orders: pd.DataFrame) -> list[tuple]:
    a = orders[orders["o_orderdate"] < _CUT]["o_custkey"]
    b = orders[orders["o_orderdate"] >= _CUT]["o_custkey"]
    ka, kb = set(_kmv_head(a)), set(_kmv_head(b))
    ku = sorted(ka | kb)[:64]
    k_used = len(ku)
    n_both = sum(1 for h in ku if h in ka and h in kb)
    est_union = k_used if k_used < 64 else tdiv(63 * 4_294_967_296, ku[-1])
    return [(
        k_used, est_union, n_both,
        tdiv(n_both * 1_000_000, k_used),
        tdiv(est_union * n_both, k_used),
    )]


def _bloom_probe_ref(cust: pd.DataFrame, orders: pd.DataFrame) -> list[tuple]:
    members = {int(k) for k in orders["o_custkey"]}
    bits = {
        _md5i(f"{i}_{k}") % 4096 for k in members for i in range(3)
    }
    seg: dict[str, list] = {}
    for _, r in cust.iterrows():
        key, s = int(r["c_custkey"]), r["c_mktsegment"]
        n_hit = sum(
            1 for i in range(3) if _md5i(f"{i}_{key}") % 4096 in bits
        )
        pos, mem = n_hit == 3, key in members
        cur = seg.setdefault(s, [0, 0, 0, 0, 0])
        cur[0] += 1
        cur[1] += mem
        cur[2] += pos
        cur[3] += pos and not mem
        cur[4] += (not pos) and mem
    return sorted((s, *v) for s, v in seg.items())


# ---------------------------------------------------------------------------
# panels
# ---------------------------------------------------------------------------


def _orders_panel(seed: int) -> pd.DataFrame:
    """shape by seed % 6: 0 both sides, 1 side-a only, 2 side-b only,
    3 <64 distinct, 4 >64 distinct both sides, 5 single order.
    (the fully-EMPTY panel is its own named test, not a seed shape)"""
    rng = random.Random(67_000 + seed)
    shape = seed % 6
    rows = []
    n = {3: rng.randint(3, 20), 4: rng.randint(150, 300), 5: 1}.get(
        shape, rng.randint(20, 120)
    )
    for ok in range(n):
        key = rng.randint(-50, 10_000) if shape == 0 else rng.randint(1, 5_000)
        if shape == 1:
            day = rng.randint(0, 1000)  # all before the cut
            ts = _CUT - pd.Timedelta(days=1 + day)
        elif shape == 2:
            ts = _CUT + pd.Timedelta(days=rng.randint(0, 700))
        else:
            ts = _CUT + pd.Timedelta(days=rng.randint(-1000, 700))
        rows.append((ok, key, ts))
    return pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderdate"])


def _docs_panel(seed: int) -> pd.DataFrame:
    """shape by seed % 5: 0 multi-source, 1 single source, 2 shared
    texts across sources (merge==direct stress), 3 NULL-text rows
    (incl. one source that is ALL NULL), 4 single doc."""
    rng = random.Random(71_000 + seed)
    shape = seed % 5
    sources = ["web", "books", "code"] if shape != 1 else ["web"]
    rows = []
    n = 1 if shape == 4 else rng.randint(10, 60)
    shared = [f"shared text {i}" for i in range(5)]
    for d in range(n):
        src = rng.choice(sources)
        if shape == 2:
            text = rng.choice(shared)
        elif shape == 3 and (src == "code" or rng.random() < 0.2):
            text = None
        else:
            text = f"doc {seed} {rng.randint(0, 30)}"
        rows.append((d, text, "en", src, len(text) if text else 0))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    return pdf


def _li_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(73_000 + seed)
    shape = seed % 4  # 0 normal, 1 empty, 2 >64 distinct, 3 single row
    if shape == 1:
        rows = []
    elif shape == 3:
        rows = [(0, 7, 7)]
    else:
        n = rng.randint(200, 400) if shape == 2 else rng.randint(10, 80)
        hi = 500 if shape == 2 else 30
        rows = [
            (lk, rng.randint(1, hi), rng.randint(1, hi)) for lk in range(n)
        ]
    return pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_suppkey"])


def _cust_panel(seed: int) -> pd.DataFrame:
    rng = random.Random(79_000 + seed)
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    rows = [
        (k, rng.choice(segs)) for k in range(1, rng.randint(20, 200))
    ]
    return pd.DataFrame(rows, columns=["c_custkey", "c_mktsegment"])


def _rows(df_pdf: pd.DataFrame) -> list[tuple]:
    return [
        tuple(
            None if pd.isna(v) else (v if isinstance(v, str) else int(v))
            for v in r
        )
        for r in df_pdf.itertuples(index=False)
    ]


# ---------------------------------------------------------------------------
# DuckDB-oracle sweeps
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_hll_registers(seed):
    orders = _orders_panel(seed)
    got = _rows(_duck({"orders": orders}, QUERIES["q_hll_registers"].oracle))
    assert got == _hll_registers_ref(orders)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_hll_merge(seed):
    docs = _docs_panel(seed)
    got = _rows(_duck({"documents": docs}, QUERIES["q_hll_merge"].oracle))
    assert got == _hll_merge_ref(docs)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_kmv_distinct(seed):
    li, orders = _li_panel(seed), _orders_panel(seed)
    got = _rows(_duck(
        {"lineitem": li, "orders": orders}, QUERIES["q_kmv_distinct"].oracle
    ))
    assert got == _kmv_distinct_ref(li, orders)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_kmv_setops(seed):
    orders = _orders_panel(seed)
    got = _rows(_duck({"orders": orders}, QUERIES["q_kmv_setops"].oracle))
    assert got == _kmv_setops_ref(orders)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_bloom_probe(seed):
    cust, orders = _cust_panel(seed), _orders_panel(seed)
    got = _rows(_duck(
        {"customer": cust, "orders": orders}, QUERIES["dd_bloom_probe"].oracle
    ))
    assert got == _bloom_probe_ref(cust, orders)


def test_fuzz_bloom_probe_empty_members():
    """Empty member set: every probe negative, zero false negatives."""
    cust = _cust_panel(0)
    orders = pd.DataFrame(
        [], columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    got = _rows(_duck(
        {"customer": cust, "orders": orders}, QUERIES["dd_bloom_probe"].oracle
    ))
    assert got == _bloom_probe_ref(cust, orders)
    assert all(r[3] == 0 and r[5] == 0 for r in got)  # no pos, no false neg


# ---------------------------------------------------------------------------
# the caught divergence: empty orders must raise the SAME named error
# ---------------------------------------------------------------------------

_EMPTY_ORDERS = pd.DataFrame(
    {
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
    }
)


def test_kmv_setops_empty_raises_duckdb():
    with pytest.raises(duckdb.Error, match="empty KMV sketch"):
        _duck({"orders": _EMPTY_ORDERS}, QUERIES["q_kmv_setops"].oracle)


def test_kmv_setops_empty_raises_spark(spark, tmp_path):
    df = _spark_run(
        spark, tmp_path, 0, "q_kmv_setops", {"orders": _EMPTY_ORDERS},
        {"orders": _ORD_SCHEMA},
    )
    with pytest.raises(Exception, match="empty KMV sketch"):
        df.collect()


# ---------------------------------------------------------------------------
# Spark-builder subsets
# ---------------------------------------------------------------------------

_SPARK_SEEDS = [0, 1, 4]  # both-sides / one-side-empty / >k universes


@pytest.mark.parametrize("seed", _SPARK_SEEDS)
@pytest.mark.parametrize(
    "name", ["q_hll_registers", "q_kmv_setops", "q_kmv_distinct",
             "dd_bloom_probe", "q_hll_merge"]
)
def test_fuzz_sketches_spark(spark, tmp_path, seed, name):
    panels = {
        "orders": _orders_panel(seed),
        "lineitem": _li_panel(seed),
        "customer": _cust_panel(seed),
        "documents": _docs_panel(seed),
    }
    schemas = {
        "orders": _ORD_SCHEMA,
        "lineitem": _LI_SCHEMA,
        "customer": _CUST_SCHEMA,
        "documents": _DOC_SCHEMA,
    }
    refs = {
        "q_hll_registers": lambda p: _hll_registers_ref(p["orders"]),
        "q_hll_merge": lambda p: _hll_merge_ref(p["documents"]),
        "q_kmv_distinct": lambda p: _kmv_distinct_ref(
            p["lineitem"], p["orders"]
        ),
        "q_kmv_setops": lambda p: _kmv_setops_ref(p["orders"]),
        "dd_bloom_probe": lambda p: _bloom_probe_ref(
            p["customer"], p["orders"]
        ),
    }
    df = _spark_run(spark, tmp_path, seed, name, panels, schemas)
    got = [
        tuple(
            None if v is None else (v if isinstance(v, str) else int(v))
            for v in r
        )
        for r in df.collect()
    ]
    assert got == refs[name](panels)

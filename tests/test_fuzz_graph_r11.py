"""Round-11 seeded differential fuzzing for the graph fixed-point
family (the r10/r11 fuzz discipline extended to the iterative
operators): ``q_graph_bfs``, ``q_graph_kcore``, ``q_graph_triangles``,
``q_graph_modularity``, ``q_graph_cheapest_path`` over the MinHash-LSH
candidate graph, and ``q_graph_pagerank`` / ``q_graph_link_predict``
over relational edge lists — each on 60 random panels against
independent pure-Python references (the full LSH pipeline re-derived
from hashlib.md5: tokenize → 8 seeded min-hashes → 4×2 banding →
bucket-cap → pair join), asserting EXACT equality. Registered DuckDB
oracle per seed, Spark-builder subsets on tmp parquet, committed seed
constants (the tests/test_fuzz_stats_r10.py harness design).

What this sweeps that the fixed harness corpus cannot: >20 exact
duplicates of one text (every band bucket crosses the max_bucket=20
cap and the clique must VANISH from capped graphs while staying in the
uncapped modularity/cheapest-path graphs), boundary-size cliques that
ride exactly at the cap, zero-edge corpora (unique vocabularies — the
empty-graph arms of six aggregates, incl. pagerank over an EMPTY edge
list, the shape class that caught the sub-k k-means crash this round),
single-document corpora, whitespace-only documents that produce no
signature row, chained overlapping near-dup clusters (longer BFS /
cheapest-path frontiers than any dup cluster in the harness corpus),
and parts whose supplier degree crosses the link-predict HAVING band.

All arithmetic is integer-exact (md5-derived 32-bit min-hashes, x1e6 /
x1e9 trunc-division fixed point), so any mismatch is a real
engine/reference divergence, never float noise.
"""

from __future__ import annotations

import os
import hashlib
import random

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
_LI_SCHEMA = "l_orderkey long, l_suppkey long, l_partkey long"
_ORD_SCHEMA = "o_orderkey long, o_custkey long"


# ---------------------------------------------------------------------------
# pure-Python LSH pipeline (the oracles' CTE prologue re-derived)
# ---------------------------------------------------------------------------


def _toks(text):
    if text is None:
        return []
    return [t for t in text.strip().split() if t != ""]


def _h(i: int, tok: str) -> int:
    return int(hashlib.md5(f"{i}_{tok}".encode()).hexdigest()[:8], 16)


def _sigs(pdf: pd.DataFrame, id_max: int | None = None) -> dict[int, list]:
    out = {}
    for _, r in pdf.iterrows():
        did = int(r["doc_id"])
        if id_max is not None and did >= id_max:
            continue
        toks = set(_toks(r["text"]))
        if not toks:
            continue  # GROUP BY over zero token rows: no signature row
        out[did] = [min(_h(i, t) for t in toks) for i in range(8)]
    return out


def _bands(sigs: dict[int, list]):
    return [
        (did, b, f"{s[2 * b]}_{s[2 * b + 1]}")
        for did, s in sigs.items()
        for b in range(4)
    ]


def _pairs(bands, cap: int | None):
    buckets: dict[tuple, list] = {}
    for did, b, val in bands:
        buckets.setdefault((b, val), []).append(did)
    out = set()
    for members in buckets.values():
        if cap is not None and len(members) > cap:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b2 in ms[i + 1:]:
                out.add((a, b2))
    return out


def _sym(pairs):
    return {(u, v) for u, v in pairs} | {(v, u) for u, v in pairs}


# ---------------------------------------------------------------------------
# per-query references
# ---------------------------------------------------------------------------


def _bfs_ref(pdf):
    pairs = _pairs(_bands(_sigs(pdf)), cap=20)
    edges = _sym(pairs)
    nodes = {u for u, _ in edges}
    dist = {n: 0 for n in nodes if n % 10 == 0}
    frontier = set(dist)
    for d in range(1, 5):
        nxt = {v for u, v in edges if u in frontier} - set(dist)
        for v in nxt:
            dist[v] = d
        frontier = nxt
    hist: dict[int, int] = {}
    for n in nodes:
        hop = dist.get(n, -1)
        hist[hop] = hist.get(hop, 0) + 1
    return sorted(hist.items())


def _kcore_ref(pdf):
    e = _pairs(_bands(_sigs(pdf)), cap=20)
    out = []
    for rnd in (1, 2, 3):
        deg: dict[int, int] = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= 2}
        e = {(u, v) for u, v in e if u in keep and v in keep}
        out.append((rnd, len(keep), len(e)))
    return out


def _triangles_ref(pdf):
    pairs = _pairs(_bands(_sigs(pdf)), cap=20)
    deg: dict[int, int] = {}
    adj: dict[int, set] = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        adj.setdefault(u, set()).add(v)
    n_tri = sum(
        len(adj.get(u, set()) & adj.get(v, set())) for u, v in pairs
    )
    return [(
        len(pairs),
        len(deg),
        max(deg.values()) if deg else None,
        n_tri,
    )]


def _components(edges_sym):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges_sym:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _modularity_ref(pdf):
    pairs = _pairs(_bands(_sigs(pdf, id_max=1000)), cap=None)
    edges = _sym(pairs)
    comp = _components(edges)
    m = len(pairs)
    intra: dict[int, int] = {}
    for u, v in pairs:
        if comp[u] == comp[v]:  # always true, kept for oracle fidelity
            intra[comp[u]] = intra.get(comp[u], 0) + 1
    deg_c: dict[int, int] = {}
    for u, _v in edges:
        deg_c[comp[u]] = deg_c.get(comp[u], 0) + 1
    if not deg_c:
        return [(0, 0, None)]
    q = sum(
        tdiv(intra.get(c, 0) * 1_000_000, m)
        - tdiv(d * d * 1_000_000, 4 * m * m)
        for c, d in deg_c.items()
    )
    return [(len(deg_c), m, q)]


def _cheapest_ref(pdf):
    sigs = _sigs(pdf, id_max=500)
    pairs = _pairs(_bands(sigs), cap=None)
    w = {
        (u, v): 1 + sum(1 for i in range(8) if sigs[u][i] != sigs[v][i])
        for u, v in pairs
    }
    edges = {**w, **{(v, u): c for (u, v), c in w.items()}}
    nodes = {u for u, _ in edges}
    states = {(n, 0, 0) for n in nodes if n % 10 == 0}
    frontier = states
    for h in range(3):
        nxt = {
            (v, h + 1, c + edges[(u, v)])
            for (u, hh, c) in frontier
            for (uu, v) in edges
            if uu == u
        } - states
        states |= nxt
        frontier = nxt
    best: dict[int, int] = {}
    for n, _h2, c in states:
        best[n] = min(best.get(n, c), c)
    hist: dict[int, int] = {}
    for c in best.values():
        hist[c] = hist.get(c, 0) + 1
    return sorted(hist.items())


def _pagerank_ref(li, orders):
    cust = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    edges = {
        (int(cust[ok]) * 2, int(sk) * 2 + 1)
        for ok, sk in zip(li["l_orderkey"], li["l_suppkey"])
        if ok in cust
    }
    nodes = sorted({u for e in edges for u in e})
    if not nodes:
        return []
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for u, _v in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: tdiv(1_000_000_000, n) for v in nodes}
    for _ in range(3):
        s: dict[int, int] = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + tdiv(rank[u], outdeg[u])
        rank = {
            v: tdiv(15 * 1_000_000_000, 100 * n)
            + tdiv(85 * s.get(v, 0), 100)
            for v in nodes
        }
    rows = [
        (
            "customer" if v % 2 == 0 else "supplier",
            tdiv(v, 2),
            rank[v],
        )
        for v in nodes
    ]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:20]


def _link_predict_ref(li):
    edges = {(int(s), int(p)) for s, p in zip(li["l_suppkey"], li["l_partkey"])}
    by_part: dict[int, list] = {}
    for s, p in edges:
        by_part.setdefault(p, []).append(s)
    scored: dict[tuple, list] = {}
    for p, supps in by_part.items():
        d = len(supps)
        if not (2 <= d <= 50):
            continue
        ra = tdiv(1_000_000, d)
        ss = sorted(supps)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                cur = scored.setdefault((s1, s2), [0, 0])
                cur[0] += 1
                cur[1] += ra
    rows = [(s1, s2, c, ra) for (s1, s2), (c, ra) in scored.items()]
    rows.sort(key=lambda r: (-r[2], -r[3], r[0], r[1]))
    return rows[:20]


# ---------------------------------------------------------------------------
# panels
# ---------------------------------------------------------------------------

_VOCAB = [f"w{i}" for i in range(12)]


def _doc_panel(seed: int) -> pd.DataFrame:
    """Random documents corpus; LSH-graph shape class by seed % 8.

    0: small vocab (natural collisions)   4: empty/whitespace docs mixed
    1: planted near-dup clusters          5: single document
    2: >20 exact dups (cap must fire)     6: two at-cap cliques (15+15)
    3: chained overlapping clusters       7: unique vocab (zero edges)
    """
    rng = random.Random(59_000 + seed)
    shape = seed % 8
    texts: list[str] = []
    if shape == 0:
        texts = [
            " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(4, 10)))
            for _ in range(rng.randint(20, 50))
        ]
    elif shape == 1:
        for g in range(4):
            base = [f"g{g}t{i}" for i in range(8)]
            for _ in range(rng.randint(3, 8)):
                mut = list(base)
                if rng.random() < 0.7:
                    mut[rng.randrange(8)] = f"m{rng.randint(0, 30)}"
                texts.append(" ".join(mut))
    elif shape == 2:
        dup = " ".join(f"d{i}" for i in range(6))
        texts = [dup] * rng.randint(21, 30) + [
            " ".join(rng.choice(_VOCAB) for _ in range(6))
            for _ in range(10)
        ]
    elif shape == 3:
        toks = [f"c{i}" for i in range(24)]
        for g in range(6):
            for _ in range(rng.randint(2, 5)):
                texts.append(" ".join(toks[g * 3:g * 3 + 8]))
    elif shape == 4:
        texts = [
            rng.choice(["", "   ", None,
                        " ".join(rng.choice(_VOCAB) for _ in range(6))])
            for _ in range(30)
        ]
    elif shape == 5:
        texts = [" ".join(_VOCAB[:5])]
    elif shape == 6:
        a = " ".join(f"a{i}" for i in range(6))
        b = " ".join(f"b{i}" for i in range(6))
        texts = [a] * 15 + [b] * 15
    else:
        texts = [f"u{seed}x{d} v{seed}y{d} z{seed}w{d}" for d in range(25)]
    rows = [
        (d, t, "en", "web", len(t) if t else 0)
        for d, t in enumerate(texts)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    return pdf


def _bipartite_panel(seed: int):
    """(lineitem, orders) panels; shape class by seed % 6.

    0: random bipartite      3: EMPTY lineitem (empty-graph arms)
    1: star onto 1 supplier  4: part degrees straddling the 2..50 band
    2: single lineitem       5: dense complete bipartite
    """
    rng = random.Random(61_000 + seed)
    shape = seed % 6
    orders_rows = [(ok, rng.randint(1, 10)) for ok in range(40)]
    li_rows: list[tuple] = []
    if shape == 0:
        for lk in range(rng.randint(30, 100)):
            li_rows.append(
                (rng.randrange(40), rng.randint(1, 5), rng.randint(1, 12))
            )
    elif shape == 1:
        for lk in range(40):
            li_rows.append((rng.randrange(40), 1, rng.randint(1, 8)))
    elif shape == 2:
        li_rows = [(0, 1, 1)]
    elif shape == 3:
        li_rows = []
    elif shape == 4:
        for p, d in ((1, 1), (2, 2), (3, 50), (4, 51), (5, 55)):
            for s in range(d):
                li_rows.append((rng.randrange(40), 100 + s, p))
    else:
        for c_ok in range(12):
            for s in range(1, 6):
                li_rows.append((c_ok, s, rng.randint(1, 6)))
    li = pd.DataFrame(
        li_rows, columns=["l_orderkey", "l_suppkey", "l_partkey"]
    )
    orders = pd.DataFrame(orders_rows, columns=["o_orderkey", "o_custkey"])
    return li, orders


def _rows(df_pdf: pd.DataFrame) -> list[tuple]:
    out = []
    for r in df_pdf.itertuples(index=False):
        out.append(tuple(
            None if pd.isna(v) else (v if isinstance(v, str) else int(v))
            for v in r
        ))
    return out


_DOC_REFS = {
    "q_graph_bfs": _bfs_ref,
    "q_graph_kcore": _kcore_ref,
    "q_graph_triangles": _triangles_ref,
    "q_graph_modularity": _modularity_ref,
    "q_graph_cheapest_path": _cheapest_ref,
}


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("name", sorted(_DOC_REFS))
def test_fuzz_graph_duck(name, seed):
    pdf = _doc_panel(seed)
    got = _rows(_duck({"documents": pdf}, QUERIES[name].oracle))
    assert got == [tuple(r) for r in _DOC_REFS[name](pdf)]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pagerank_duck(seed):
    li, orders = _bipartite_panel(seed)
    got = _rows(_duck(
        {"lineitem": li, "orders": orders},
        QUERIES["q_graph_pagerank"].oracle,
    ))
    assert got == _pagerank_ref(li, orders)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_link_predict_duck(seed):
    li, _orders = _bipartite_panel(seed)
    got = _rows(_duck(
        {"lineitem": li}, QUERIES["q_graph_link_predict"].oracle
    ))
    assert got == _link_predict_ref(li)


# ---------------------------------------------------------------------------
# Spark-builder subsets (empty-graph + cap-boundary shapes included)
# ---------------------------------------------------------------------------

_DOC_SPARK_SEEDS = [0, 2, 5, 7]  # natural / cap-fires / single-doc / no-edges


@pytest.mark.parametrize("seed", _DOC_SPARK_SEEDS)
@pytest.mark.parametrize("name", sorted(_DOC_REFS))
def test_fuzz_graph_spark(spark, tmp_path, name, seed):
    pdf = _doc_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, name, {"documents": pdf},
        {"documents": _DOC_SCHEMA},
    )
    got = [
        tuple(
            None if v is None else (v if isinstance(v, str) else int(v))
            for v in r
        )
        for r in df.collect()
    ]
    assert got == [tuple(r) for r in _DOC_REFS[name](pdf)]


@pytest.mark.parametrize("seed", [0, 3, 4])  # random / EMPTY edges / deg band
@pytest.mark.parametrize(
    "name, ref",
    [
        ("q_graph_pagerank", None),
        ("q_graph_link_predict", None),
    ],
)
def test_fuzz_graph_bipartite_spark(spark, tmp_path, seed, name, ref):
    li, orders = _bipartite_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, name,
        {"lineitem": li, "orders": orders},
        {"lineitem": _LI_SCHEMA, "orders": _ORD_SCHEMA},
    )
    got = [
        tuple(v if isinstance(v, str) else int(v) for v in r)
        for r in df.collect()
    ]
    expected = (
        _pagerank_ref(li, orders)
        if name == "q_graph_pagerank"
        else _link_predict_ref(li)
    )
    assert got == expected

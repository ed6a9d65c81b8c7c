"""Round-11 seeded differential fuzzing for the retrieval/dedup
fixed-point family (VERDICT r10 item 4): BM25, TF-IDF, MinHash
calibration, LSH band tuning, and PQ asymmetric-distance search run on
~100 random corpus shapes each against independent pure-Python
references, asserting EXACT equality — the same harness design as
tests/test_fuzz_stats_r10*.py (registered DuckDB oracle per seed,
3-seed Spark-builder subset on tmp parquet, committed seed constants).

What this sweeps that the fixed harness corpus cannot: empty posting
lists (no document contains a query term), single-document corpora,
all-query-term documents, identical-text near-dup clusters, degenerate
all-zero embeddings, and the trunc-division/ln-snap staging under
every one of those shapes. Transcendental note: BM25/TF-IDF snap
runtime ln to x1e6 integers; the pure-Python reference calls the same
libm, so a disagreement here would surface a REAL engine-vs-libm ulp
landmine (the r8 class), not test noise — sqrt-free operators stay
exact by construction.
"""

from __future__ import annotations

import os
import hashlib
import math
import random

import pandas as pd
import pytest

from p6_spark.plans.registry import QUERIES
from tests.test_fuzz_stats_r10 import SPARK_SEEDS, _duck, _spark_run, rha, tdiv

# Driver-budget gating (round 12, VERDICT r11 item 5): the full fuzz
# panels (~4,500 parametrized cases across the r10/r11 files) pushed
# the default pytest run past the driver wall budget (VERIFY_r11
# tests_ok=false, tail cut at 81%). Default = the seeded first 12
# cases per panel (deterministic, still covers the generator shape
# classes); P6_FUZZ_FULL=1 restores the full sweep — run it in build
# rounds / before changing any covered operator.
SEEDS = list(range(100 if os.environ.get("P6_FUZZ_FULL") == "1" else 12))

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"

_QUERY_TERMS = ("vector", "stream", "window")
_FILLERS = (
    "alpha", "beta", "gamma", "delta", "data", "code", "test", "graph",
    "table", "spark", "index", "merge", "token", "batch", "shard",
)


def _docs_pdf(rows: list[tuple[int, str]]) -> pd.DataFrame:
    return pd.DataFrame(
        [(d, t, "en", "web", len(t)) for d, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# txt_bm25
# ---------------------------------------------------------------------------


def _bm25_panel(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(23_000 + seed)
    shape = seed % 8
    vocab = list(_FILLERS[: rng.randint(3, len(_FILLERS))])
    if shape == 0:
        pool = vocab  # NO query terms anywhere -> empty posting lists
    elif shape == 2:
        pool = list(_QUERY_TERMS)  # only query terms
    else:
        pool = vocab + list(_QUERY_TERMS)
    n_docs = 1 if shape == 1 else rng.randint(2, 120)
    rows = []
    for d in range(n_docs):
        n_tok = 0 if (shape == 3 and d % 5 == 0) else rng.randint(1, 30)
        rows.append((d, " ".join(rng.choice(pool) for _ in range(n_tok))))
    return rows


def _bm25_ref(rows: list[tuple[int, str]]) -> list[tuple]:
    toks = {d: t.split() for d, t in rows if t.split()}
    dl = {d: len(t) for d, t in toks.items()}
    n, t_total = len(dl), sum(dl.values())
    qtf: dict[tuple[int, str], int] = {}
    for d, t in toks.items():
        for term in _QUERY_TERMS:
            c = t.count(term)
            if c:
                qtf[(d, term)] = c
    df: dict[str, int] = {}
    for (_, term) in qtf:
        df[term] = df.get(term, 0) + 1
    idf = {
        term: rha(math.log(2 * n - 2 * v + 1) * 1_000_000)
        - rha(math.log(2 * v + 1) * 1_000_000)
        for term, v in df.items()
    }
    scores: dict[int, int] = {}
    hits: dict[int, int] = {}
    for (d, term), tf in qtf.items():
        num = idf[term] * 44 * tf * t_total
        den = 20 * tf * t_total + 6 * t_total + 18 * dl[d] * n
        scores[d] = scores.get(d, 0) + tdiv(num, den)
        hits[d] = hits.get(d, 0) + 1
    ranked = sorted(scores, key=lambda d: (-scores[d], d))[:20]
    return [(d, scores[d], hits[d]) for d in ranked]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_bm25(seed):
    rows = _bm25_panel(seed)
    got = _duck({"documents": _docs_pdf(rows)}, QUERIES["txt_bm25"].oracle)
    want = _bm25_ref(rows)
    assert (
        list(map(tuple, got[["doc_id", "bm25_x1e6", "n_terms_hit"]].values))
        == want
    )


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_bm25_spark(spark, tmp_path, seed):
    rows = _bm25_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "txt_bm25",
        {"documents": _docs_pdf(rows)}, {"documents": _DOC_SCHEMA},
    )
    got = [(r["doc_id"], r["bm25_x1e6"], r["n_terms_hit"]) for r in df.collect()]
    assert got == _bm25_ref(rows)


# ---------------------------------------------------------------------------
# txt_tfidf
# ---------------------------------------------------------------------------


def _tfidf_panel(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(29_000 + seed)
    shape = seed % 8
    vocab = list(_FILLERS[: rng.randint(2, len(_FILLERS))])
    n_docs = 1 if shape == 1 else rng.randint(2, 150)
    base = 50 if shape == 0 else 0  # shape 0: every doc_id >= 50 -> empty
    rows = []
    for d in range(n_docs):
        n_tok = 1 if shape == 2 else rng.randint(1, 25)
        rows.append((base + d, " ".join(rng.choice(vocab) for _ in range(n_tok))))
    return rows


def _tfidf_ref(rows: list[tuple[int, str]]) -> list[tuple]:
    n_docs = len(rows)
    tf: dict[tuple[int, str], int] = {}
    for d, t in rows:
        for tok in t.split():
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df: dict[str, int] = {}
    for (_, tok) in tf:
        df[tok] = df.get(tok, 0) + 1
    out = []
    for d in sorted({d for d, _ in rows if d < 50}):
        terms = [
            (
                tok,
                tf[(d, tok)],
                df[tok],
                tf[(d, tok)]
                * math.floor(math.log(n_docs / df[tok]) * 1_000_000 + 0.5),
            )
            for (dd, tok) in tf
            if dd == d
        ]
        terms.sort(key=lambda r: (-r[3], r[0]))
        out.extend((d, tok, f, v, s) for tok, f, v, s in terms[:3])
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tfidf(seed):
    rows = _tfidf_panel(seed)
    got = _duck({"documents": _docs_pdf(rows)}, QUERIES["txt_tfidf"].oracle)
    assert (
        list(map(tuple, got[["doc_id", "token", "tf", "df", "tfidf_x1e6"]].values))
        == _tfidf_ref(rows)
    )


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_tfidf_spark(spark, tmp_path, seed):
    rows = _tfidf_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "txt_tfidf",
        {"documents": _docs_pdf(rows)}, {"documents": _DOC_SCHEMA},
    )
    got = [
        (r["doc_id"], r["token"], r["tf"], r["df"], r["tfidf_x1e6"])
        for r in df.collect()
    ]
    assert got == _tfidf_ref(rows)


# ---------------------------------------------------------------------------
# MinHash signatures / LSH candidates (shared by the two sketch queries)
# ---------------------------------------------------------------------------


def _sketch_panel(seed: int) -> list[tuple[int, str]]:
    """Small vocab on purpose: minhash values concentrate, buckets get
    dense, near-dup clusters form — the regime the sketches exist for.
    Shapes: 0 = singleton corpus (no pairs), 1 = identical texts
    (jaccard exactly 1e6), 2 = disjoint vocab halves (zero overlap
    unless banded by luck)."""
    rng = random.Random(31_000 + seed)
    shape = seed % 8
    vocab = list(_FILLERS[: rng.randint(4, 10)])
    if shape == 0:
        return [(0, " ".join(rng.choice(vocab) for _ in range(8)))]
    if shape == 1:
        text = " ".join(rng.choice(vocab) for _ in range(10))
        return [(d, text) for d in range(rng.randint(2, 6))]
    n_docs = rng.randint(2, 60)
    rows = []
    for d in range(n_docs):
        if shape == 2:
            pool = vocab[: len(vocab) // 2] if d % 2 else vocab[len(vocab) // 2:]
        else:
            pool = vocab
        rows.append(
            (d, " ".join(rng.choice(pool) for _ in range(rng.randint(1, 20))))
        )
    return rows


def _signatures(rows: list[tuple[int, str]]) -> dict[int, list[int]]:
    sigs = {}
    for d, t in rows:
        toks = set(t.split())
        if toks:
            sigs[d] = [
                min(_md5_int(f"{i}_{tok}") for tok in toks) for i in range(8)
            ]
    return sigs


def _cand_pairs(
    sigs: dict[int, list[int]], band_size: int
) -> set[tuple[int, int]]:
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, h in sigs.items():
        for b in range(8 // band_size):
            key = (b, "_".join(str(h[b * band_size + j]) for j in range(band_size)))
            buckets.setdefault(key, []).append(d)
    pairs = set()
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                pairs.add((min(a, b), max(a, b)))
    return pairs


def _est_x1e6(sa: list[int], sb: list[int]) -> int:
    return sum(1 for x, y in zip(sa, sb) if x == y) * 125_000


def _minhash_calibration_ref(rows: list[tuple[int, str]]) -> list[tuple]:
    sigs = _signatures(rows)
    dtoks = {d: set(t.split()) for d, t in rows if t.split()}
    buckets: dict[int, list[int]] = {}
    for a, b in _cand_pairs(sigs, band_size=2):
        est = _est_x1e6(sigs[a], sigs[b])
        inter = len(dtoks[a] & dtoks[b])
        exact = (inter * 1_000_000) // (len(dtoks[a]) + len(dtoks[b]) - inter)
        buckets.setdefault(est // 250_000, []).append(exact)
    return [
        (k, len(v), sum(v) // len(v), min(v), max(v))
        for k, v in sorted(buckets.items())
    ]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_minhash_calibration(seed):
    rows = _sketch_panel(seed)
    got = _duck(
        {"documents": _docs_pdf(rows)}, QUERIES["dd_minhash_calibration"].oracle
    )
    assert list(map(tuple, got.values)) == _minhash_calibration_ref(rows)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_minhash_calibration_spark(spark, tmp_path, seed):
    rows = _sketch_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "dd_minhash_calibration",
        {"documents": _docs_pdf(rows)}, {"documents": _DOC_SCHEMA},
    )
    assert [tuple(r) for r in df.collect()] == _minhash_calibration_ref(rows)


def _lsh_tuning_ref(rows: list[tuple[int, str]]) -> list[tuple]:
    sigs = _signatures(rows)
    out = []
    for band_size in (1, 2, 4, 8):
        pairs = _cand_pairs(sigs, band_size)
        est_sum = sum(_est_x1e6(sigs[a], sigs[b]) for a, b in pairs)
        out.append(
            (
                band_size,
                8 // band_size,
                len(pairs),
                est_sum // len(pairs) if pairs else 0,
            )
        )
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_lsh_tuning(seed):
    rows = _sketch_panel(seed)
    got = _duck({"documents": _docs_pdf(rows)}, QUERIES["dd_lsh_tuning"].oracle)
    assert list(map(tuple, got.values)) == _lsh_tuning_ref(rows)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_lsh_tuning_spark(spark, tmp_path, seed):
    rows = _sketch_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "dd_lsh_tuning",
        {"documents": _docs_pdf(rows)}, {"documents": _DOC_SCHEMA},
    )
    assert [tuple(r) for r in df.collect()] == _lsh_tuning_ref(rows)


# ---------------------------------------------------------------------------
# sim_pq_search — ADC distance arithmetic
# ---------------------------------------------------------------------------

_DIM, _SUBS, _SUBDIM = 64, 8, 8


def _pq_panel(seed: int) -> pd.DataFrame:
    """Vectors are k/64 (binary-exact in float32 AND double, and
    v*1000 = 15.625k is exact, so the x1000 round is unambiguous).
    Shapes: 0 = single vector (query, zero matches), 1 = all-zero
    vectors (code 0 everywhere, pure-tie ranking), 2 = three vectors
    (queries match only each other)."""
    rng = random.Random(37_000 + seed)
    shape = seed % 8
    n = {0: 1, 1: rng.randint(4, 12), 2: 3}.get(shape, rng.randint(4, 24))
    rows = []
    for vid in range(n):
        if shape == 1:
            vec = [0.0] * _DIM
        else:
            vec = [rng.randint(-64, 64) / 64 for _ in range(_DIM)]
        rows.append((vid, vec, rng.randint(0, 9)))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


def _pq_ref(pdf: pd.DataFrame) -> list[tuple]:
    vecs = {int(r.vec_id): list(r.embedding) for r in pdf.itertuples()}
    qi = {
        vid: [rha(x * 1000) for x in v] for vid, v in vecs.items() if vid < 3
    }
    codes = {}
    for vid, v in vecs.items():
        codes[vid] = [
            sum(
                (1 << j)
                for j in range(_SUBDIM)
                if rha(v[s * _SUBDIM + j] * 1000) > 0
            )
            for s in range(_SUBS)
        ]
    out = []
    for q in sorted(qi):
        scored = []
        for vid, cs in codes.items():
            if vid == q:
                continue
            adc = 0
            for s, code in enumerate(cs):
                for j in range(_SUBDIM):
                    x = qi[q][s * _SUBDIM + j]
                    adc += x if (code >> j) & 1 else -x
            scored.append((vid, adc))
        scored.sort(key=lambda r: (-r[1], r[0]))
        out.extend((q, rnk + 1, vid, adc) for rnk, (vid, adc) in enumerate(scored[:5]))
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pq_search(seed):
    pdf = _pq_panel(seed)
    got = _duck({"embeddings": pdf}, QUERIES["sim_pq_search"].oracle)
    assert list(map(tuple, got.values)) == _pq_ref(pdf)


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_pq_search_spark(spark, tmp_path, seed):
    pdf = _pq_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "sim_pq_search",
        {"embeddings": pdf}, {"embeddings": _EMB_SCHEMA},
    )
    assert [tuple(r) for r in df.collect()] == _pq_ref(pdf)


# ---------------------------------------------------------------------------
# sim_ivf_ann — fixed-point Lloyd's + probe selection + integer-L2 re-rank
# ---------------------------------------------------------------------------


def _ivf_panel(seed: int) -> pd.DataFrame:
    """Shapes: 0 = fewer vectors than centroids, 1 = all-zero vectors
    (every distance ties), 2 = identical vectors (centroid collapse),
    3 = exactly k vectors."""
    rng = random.Random(41_000 + seed)
    shape = seed % 8
    n = {0: 4, 1: rng.randint(4, 12), 2: rng.randint(4, 10), 3: 8}.get(
        shape, rng.randint(9, 24)
    )
    base = [rng.randint(-64, 64) / 64 for _ in range(_DIM)]
    rows = []
    for vid in range(n):
        if shape == 1:
            vec = [0.0] * _DIM
        elif shape == 2:
            vec = list(base)
        else:
            vec = [rng.randint(-64, 64) / 64 for _ in range(_DIM)]
        rows.append((vid, vec, rng.randint(0, 9)))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


def _ivf_ref(pdf: pd.DataFrame) -> list[tuple]:
    qv = {
        int(r.vec_id): [rha(x * 10_000) for x in r.embedding]
        for r in pdf.itertuples()
    }
    order = sorted(qv, key=lambda v: (_md5_int(str(v)), v))
    cents = {cid: list(qv[order[cid]]) for cid in range(min(8, len(order)))}

    def d2(a: list[int], b: list[int]) -> int:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(c):
        return {
            vid: min((d2(v, m), cid) for cid, m in c.items())[1]
            for vid, v in qv.items()
        }

    for _ in range(2):  # two unrolled Lloyd rounds
        a = assign(cents)
        new = {}
        for cid, m in cents.items():
            members = [qv[vid] for vid, c in a.items() if c == cid]
            if members:
                new[cid] = [
                    tdiv(sum(v[p] for v in members), len(members))
                    for p in range(_DIM)
                ]
            else:
                new[cid] = m
        cents = new
    final_assign = assign(cents)
    out = []
    for q in sorted(v for v in qv if v < 3):
        probes = sorted(
            (d2(qv[q], m), cid) for cid, m in cents.items()
        )[:2]
        probe_cids = {cid for _, cid in probes}
        scored = sorted(
            (d2(qv[q], qv[vid]), vid)
            for vid, cid in final_assign.items()
            if cid in probe_cids and vid != q
        )
        out.extend(
            (q, vid, d, rnk + 1) for rnk, (d, vid) in enumerate(scored[:5])
        )
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_ivf_ann(seed):
    pdf = _ivf_panel(seed)
    got = _duck({"embeddings": pdf}, QUERIES["sim_ivf_ann"].oracle)
    assert (
        list(map(tuple, got[["query_id", "match_id", "dist2", "rnk"]].values))
        == _ivf_ref(pdf)
    )


@pytest.mark.parametrize("seed", SPARK_SEEDS)
def test_fuzz_ivf_ann_spark(spark, tmp_path, seed):
    pdf = _ivf_panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, "sim_ivf_ann",
        {"embeddings": pdf}, {"embeddings": _EMB_SCHEMA},
    )
    got = [
        (r["query_id"], r["match_id"], r["dist2"], r["rnk"]) for r in df.collect()
    ]
    assert got == _ivf_ref(pdf)

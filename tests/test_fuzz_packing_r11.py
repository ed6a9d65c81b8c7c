"""Round-11 seeded differential fuzzing for the packing/curation
dead-letter family (the r10/r11 fuzz discipline extended to the three
ROUND-10 twins): ``pipe_sequence_packing_deadletter``,
``pipe_quality_budget_cut_deadletter``, and
``pipe_percentile_prune_deadletter`` run on 100 random corpus shapes
each against independent pure-Python references, asserting EXACT
equality — registered DuckDB oracle per seed, 3-seed Spark-builder
subset on tmp parquet, committed seed constants (the
tests/test_fuzz_stats_r10.py harness design).

What this sweeps that the fixed harness corpus cannot: all-dirty
corpora (every document empty/NULL — the twins must emit ONLY
dead-letter rows while the raising forms would abort), a language whose
documents are all dirty (the percentile twin's full-outer-join arm),
whitespace-only and NULL text, single-document corpora, documents with
>2,148 distinct tokens so distinct*1e6 crosses INT32 and only the
staged-bigint multiply keeps the score exact (the _jaccard_scored
overflow lesson, ADVICE r8), ~9e12-char documents rolling through the
packing prefix sum, budget boundaries landing exactly ON a cum value,
and degenerate quartiles (nd//4 == 0 → the -1 threshold sentinel).
On fully-clean panels each twin is additionally cross-checked against
its RAISING form's oracle (twin == raising + empty dead channel), so
the fuzz also re-derives the test_deadletter_r10.py clean-corpus pin
under random shapes.

All arithmetic here is integer-exact (trunc division via tdiv, no
transcendentals), so any mismatch is a real engine/reference
divergence, never float noise.
"""

from __future__ import annotations

import os
import random
import re

import pandas as pd
import pytest

from p6_spark.plans.registry import QUERIES
from tests.test_fuzz_stats_r10 import SPARK_SEEDS, _duck, _spark_run, tdiv

# Driver-budget gating (round 12, VERDICT r11 item 5): the full fuzz
# panels (~4,500 parametrized cases across the r10/r11 files) pushed
# the default pytest run past the driver wall budget (VERIFY_r11
# tests_ok=false, tail cut at 81%). Default = the seeded first 12
# cases per panel (deterministic, still covers the generator shape
# classes); P6_FUZZ_FULL=1 restores the full sweep — run it in build
# rounds / before changing any covered operator.
SEEDS = list(range(100 if os.environ.get("P6_FUZZ_FULL") == "1" else 12))
_PACK_BUDGET = 4096  # pinned: packing_r7._PACK_BUDGET

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_LANGS = ["de", "en", "es", "fr", "zh"]
_VOCAB = [f"w{i}" for i in range(40)]
_DIRTY_TEXT = (None, "", "   ", "\t\n ")


def _tokens(text):
    """The shared tokenizer: split on whitespace, drop empties; NULL
    text yields None (a NULL token list → the dead side)."""
    if text is None:
        return None
    return [t for t in re.split(r"\s+", text.strip()) if t != ""]


def _panel(seed: int) -> pd.DataFrame:
    """Random documents corpus; shape class by seed % 8.

    0: clean, small vocab (dup-heavy scores)      4: ~30% dirty rows
    1: one language all-dirty                     5: single-doc corpus
    2: ALL documents dirty                        6: huge n_chars (~9e12)
    3: wide-vocab docs (>2,148 distinct tokens)   7: dirty + unseen langs
    """
    rng = random.Random(47_000 + seed)
    shape = seed % 8
    rows: list[tuple] = []
    all_dirty_lang = rng.choice(_LANGS) if shape == 1 else None
    n_docs = 1 if shape == 5 else rng.randint(4, 40)
    langs = _LANGS + (["xx", "yy"] if shape == 7 else [])
    for doc_id in range(n_docs):
        lang = rng.choice(langs)
        dirty = (
            shape == 2
            or lang == all_dirty_lang
            or (shape in (4, 7) and rng.random() < 0.3)
        )
        if dirty:
            text = rng.choice(_DIRTY_TEXT)
            n_chars = rng.choice((None, 0, -7))
        elif shape == 3:
            n_distinct = rng.randint(2_149, 3_000)
            text = " ".join(f"u{i}" for i in range(n_distinct))
            n_chars = rng.randint(1, 50_000)
        else:
            n_tok = rng.randint(1, 30)
            text = " ".join(rng.choice(_VOCAB) for _ in range(n_tok))
            hi = 9_000_000_000_000 if shape == 6 else 50_000
            n_chars = rng.randint(1, hi)
        rows.append((doc_id, text, lang, "web", n_chars))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    return pdf


def _is_clean(pdf: pd.DataFrame) -> bool:
    for _, r in pdf.iterrows():
        t = _tokens(r["text"])
        n = r["n_chars"]
        if t is None or len(t) < 1 or pd.isna(n) or int(n) < 1:
            return False
    return True


# ---------------------------------------------------------------------------
# pure-Python references
# ---------------------------------------------------------------------------


def _split_quality(pdf: pd.DataFrame):
    """(doc_id, lang, n_tok, qs) for clean docs + per-lang dead counts."""
    clean, dead = [], {}
    for _, r in pdf.iterrows():
        t = _tokens(r["text"])
        if t is None or len(t) < 1:
            dead[r["lang"]] = dead.get(r["lang"], 0) + 1
            continue
        qs = tdiv(len(set(t)) * 1_000_000, len(t))
        clean.append((int(r["doc_id"]), r["lang"], len(t), qs))
    return clean, dead


def _quality_ref(pdf: pd.DataFrame) -> list[tuple]:
    clean, dead = _split_quality(pdf)
    ranked = sorted(clean, key=lambda c: (-c[3], c[0]))
    budget = tdiv(sum(c[2] for c in clean), 4) if clean else None
    groups: dict[tuple, list] = {}
    cum = 0
    for doc_id, lang, n_tok, qs in ranked:
        cum += n_tok
        status = "selected" if cum <= budget else "cut"
        groups.setdefault((status, lang), []).append((n_tok, qs))
    out = [
        (s, lang, len(v), sum(x[0] for x in v), min(x[1] for x in v))
        for (s, lang), v in groups.items()
    ]
    out += [("deadletter", lang, n, 0, -1) for lang, n in dead.items()]
    return sorted(out)


def _prune_ref(pdf: pd.DataFrame) -> list[tuple]:
    clean, dead = _split_quality(pdf)
    per_lang: dict[str, list] = {}
    for _doc_id, lang, n_tok, qs in clean:
        per_lang.setdefault(lang, []).append((qs, n_tok))
    out = []
    for lang in sorted(set(per_lang) | set(dead)):
        docs = per_lang.get(lang, [])
        nd, tok_total = len(docs), sum(n for _, n in docs)
        quart = nd // 4
        threshold, n_dropped, tok_dropped = -1, 0, 0
        cum_cnt = cum_tok = 0
        for qs in sorted({q for q, _ in docs}):
            grp = [n for q, n in docs if q == qs]
            cum_cnt += len(grp)
            cum_tok += sum(grp)
            if cum_cnt <= quart:  # tie-atomic: whole score group or none
                threshold, n_dropped, tok_dropped = qs, cum_cnt, cum_tok
        out.append((lang, nd, tok_total, threshold, n_dropped,
                    nd - n_dropped, tok_dropped, dead.get(lang, 0)))
    return out


def _packing_ref(pdf: pd.DataFrame) -> list[tuple]:
    clean, n_dead = [], 0
    for _, r in pdf.sort_values("doc_id").iterrows():
        n = r["n_chars"]
        if pd.isna(n) or int(n) < 1:
            n_dead += 1
        else:
            clean.append(int(n))
    per_seq: dict[int, list] = {}
    cum = 0
    for n in clean:
        start, end = cum, cum + n - 1
        cum += n
        seq_id = tdiv(start, _PACK_BUDGET)
        straddle = 1 if seq_id != tdiv(end, _PACK_BUDGET) else 0
        per_seq.setdefault(seq_id, []).append(straddle)
    hist: dict[int, list] = {}
    for straddles in per_seq.values():
        hist.setdefault(len(straddles), []).append(sum(straddles))
    out = [(d, len(v), sum(v)) for d, v in hist.items()]
    if n_dead > 0:
        out.append((-1, n_dead, 0))
    return sorted(out)


def _rows(df_pdf: pd.DataFrame) -> list[tuple]:
    return [
        tuple(v if isinstance(v, str) else int(v) for v in r)
        for r in df_pdf.itertuples(index=False)
    ]


# ---------------------------------------------------------------------------
# DuckDB-oracle sweeps (100 seeds each)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_quality_deadletter(seed):
    pdf = _panel(seed)
    got = _rows(_duck(
        {"documents": pdf},
        QUERIES["pipe_quality_budget_cut_deadletter"].oracle,
    ))
    assert sorted(got) == _quality_ref(pdf)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_prune_deadletter(seed):
    pdf = _panel(seed)
    got = _rows(_duck(
        {"documents": pdf},
        QUERIES["pipe_percentile_prune_deadletter"].oracle,
    ))
    assert got == _prune_ref(pdf)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_packing_deadletter(seed):
    pdf = _panel(seed)
    got = _rows(_duck(
        {"documents": pdf},
        QUERIES["pipe_sequence_packing_deadletter"].oracle,
    ))
    assert got == _packing_ref(pdf)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_twin_equals_raising_on_clean_panels(seed):
    """On an all-clean panel each twin equals its raising form (the
    quality twin with selected true/false relabeled; the prune twin
    plus an all-zero n_deadletter; the packing twin verbatim) —
    re-derived under random shapes (shapes 0/3/5/6 are clean unless a
    dirty roll landed; checked dynamically)."""
    pdf = _panel(seed)
    if not _is_clean(pdf):
        return
    relabel = {True: "selected", False: "cut"}
    raising_q = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_quality_budget_cut"].oracle
    ))
    twin_q = _rows(_duck(
        {"documents": pdf},
        QUERIES["pipe_quality_budget_cut_deadletter"].oracle,
    ))
    assert sorted(
        (relabel[bool(r[0])],) + r[1:] for r in raising_q
    ) == sorted(twin_q)
    raising_p = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_percentile_prune"].oracle
    ))
    twin_p = _rows(_duck(
        {"documents": pdf},
        QUERIES["pipe_percentile_prune_deadletter"].oracle,
    ))
    assert [r + (0,) for r in raising_p] == twin_p
    raising_s = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_sequence_packing"].oracle
    ))
    twin_s = _rows(_duck(
        {"documents": pdf},
        QUERIES["pipe_sequence_packing_deadletter"].oracle,
    ))
    assert raising_s == twin_s


# ---------------------------------------------------------------------------
# Spark-builder subset (3 seeds per twin, incl. the all-dirty shape)
# ---------------------------------------------------------------------------

_SPARK_CASE_SEEDS = sorted(set(SPARK_SEEDS) | {2})  # seed 2 = all-dirty


@pytest.mark.parametrize("seed", _SPARK_CASE_SEEDS)
@pytest.mark.parametrize(
    "name, ref",
    [
        ("pipe_quality_budget_cut_deadletter", _quality_ref),
        ("pipe_percentile_prune_deadletter", _prune_ref),
        ("pipe_sequence_packing_deadletter", _packing_ref),
    ],
)
def test_fuzz_packing_family_spark(spark, tmp_path, seed, name, ref):
    pdf = _panel(seed)
    df = _spark_run(
        spark, tmp_path, seed, name, {"documents": pdf},
        {"documents": _DOC_SCHEMA},
    )
    got = [
        tuple(v if isinstance(v, str) else int(v) for v in r)
        for r in df.collect()
    ]
    expected = ref(pdf)
    if name == "pipe_quality_budget_cut_deadletter":
        got = sorted(got)
    assert got == expected

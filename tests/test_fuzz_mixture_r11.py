"""Round-11 seeded differential fuzzing for the mixture-planning
family and its new dead-letter twins (the r10/r11 fuzz discipline
applied to the code ADDED this round): ``pipe_domain_mixture_deadletter``
and ``pipe_data_epochs_deadletter`` run on 100 random corpus shapes
each against independent pure-Python water-fill references, asserting
EXACT equality — registered DuckDB oracle per seed, 3-seed
Spark-builder subset on tmp parquet, committed seed constants (the
tests/test_fuzz_stats_r10.py harness design).

What this sweeps that the fixed harness corpus cannot: a language whose
in-mixture documents are ALL dirty (zero/NULL/negative chars), ALL
languages dirty at once, a language absent from the corpus entirely,
NULL n_chars sprinkled through otherwise-clean supplies, single-document
languages, out-of-mixture languages that must be ignored, and per-doc
char counts up to ~9e12 so the summed avail_chars * 1e6 product
overflows int64 and the decimal(38,0)/HUGEINT staging is what keeps the
engines exact. On fully-clean all-languages-present panels the twins
are additionally cross-checked against the RAISING forms' oracles
(twin == raising + all-zero n_deadletter), so the fuzz also re-derives
the test_deadletter_r11.py clean-corpus pin under random shapes.

All arithmetic here is integer-exact (trunc division via tdiv, no
transcendentals), so any mismatch is a real engine/reference divergence,
never float noise.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from p6_spark.plans.packing_r7 import _MIX_W
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
_EPOCH_CAP = 4  # pinned: rigor_r9._EPOCH_CAP (repetition cutoff)

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_LANGS = sorted(_MIX_W)  # report spine order (both plans ORDER BY lang)
_DIRTY = (0, None, -3)  # all route to the dead side (NOT coalesce(>=1, f))


def _mix_panel(seed: int) -> pd.DataFrame:
    """Random (doc_id, lang, n_chars) corpus; shape class by seed % 8."""
    rng = random.Random(31_000 + seed)
    shape = seed % 8
    langs = list(_LANGS)
    absent = set()
    if shape == 3:
        absent = {rng.choice(langs)}
    all_dirty = set(langs) if shape == 2 else (
        {rng.choice(langs)} if shape == 1 else set()
    )
    hi = 9_000_000_000_000 if shape == 6 else 50_000
    rows: list[tuple] = []
    doc_id = 0
    for lang in langs:
        if lang in absent:
            continue
        n_docs = 1 if shape == 5 else rng.randint(1, 12)
        for _ in range(n_docs):
            if lang in all_dirty:
                n = rng.choice(_DIRTY)
            elif shape in (4, 7) and rng.random() < 0.3:
                n = rng.choice(_DIRTY)
            else:
                n = rng.randint(1, hi)
            rows.append((doc_id, f"doc {doc_id}", lang, "web", n))
            doc_id += 1
    if shape == 7:  # out-of-mixture languages must be ignored entirely
        for _ in range(rng.randint(1, 5)):
            rows.append((doc_id, f"doc {doc_id}", "xx", "web",
                         rng.choice((None, 0, rng.randint(1, hi)))))
            doc_id += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    return pdf


def _clean_dead(pdf: pd.DataFrame):
    """The twins' null-safe split: clean per-lang mass over n_chars >= 1
    only, dead count per lang of everything else (NULL included)."""
    avail = {lang: 0 for lang in _LANGS}
    dead = {lang: 0 for lang in _LANGS}
    for _, r in pdf.iterrows():
        lang = r["lang"]
        if lang not in _MIX_W:
            continue
        n = r["n_chars"]
        if pd.notna(n) and int(n) >= 1:
            avail[lang] += int(n)
        else:
            dead[lang] += 1
    return avail, dead


def _mixture_ref(pdf: pd.DataFrame) -> list[dict]:
    avail, dead = _clean_dead(pdf)
    total = min(tdiv(avail[g] * 1_000_000, _MIX_W[g]) for g in _LANGS)
    out = []
    for g in _LANGS:
        take = tdiv(total * _MIX_W[g], 1_000_000)
        out.append({
            "lang": g,
            "avail_chars": avail[g],
            "w_x1e6": _MIX_W[g],
            "take_chars": take,
            "rate_x1e6": -1 if avail[g] == 0
            else tdiv(take * 1_000_000, avail[g]),
            "n_deadletter": dead[g],
        })
    return out


def _epochs_ref(pdf: pd.DataFrame) -> list[dict]:
    avail, dead = _clean_dead(pdf)
    total_target = 2 * sum(avail.values())
    out = []
    for g in _LANGS:
        target = tdiv(total_target * _MIX_W[g], 1_000_000)
        granted = min(target, _EPOCH_CAP * avail[g])
        out.append({
            "lang": g,
            "avail_chars": avail[g],
            "target_chars": target,
            "granted_chars": granted,
            "epochs_x1e6": -1 if avail[g] == 0
            else tdiv(granted * 1_000_000, avail[g]),
            "unmet_chars": max(0, target - _EPOCH_CAP * avail[g]),
            "n_deadletter": dead[g],
        })
    return out


def _rows(df_pdf: pd.DataFrame) -> list[dict]:
    return [
        {k: (v if isinstance(v, str) else int(v)) for k, v in r.items()}
        for r in df_pdf.to_dict("records")
    ]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_mixture_deadletter(seed):
    pdf = _mix_panel(seed)
    got = _duck(
        {"documents": pdf}, QUERIES["pipe_domain_mixture_deadletter"].oracle
    )
    assert _rows(got) == _mixture_ref(pdf)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_epochs_deadletter(seed):
    pdf = _mix_panel(seed)
    got = _duck(
        {"documents": pdf}, QUERIES["pipe_data_epochs_deadletter"].oracle
    )
    assert _rows(got) == _epochs_ref(pdf)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_twin_equals_raising_on_clean_panels(seed):
    """On an all-clean all-present panel the twin must be the raising
    form + an all-zero n_deadletter column — re-derived here under
    random shapes (shape classes 0, 5, 6 are clean by construction)."""
    if seed % 8 not in (0, 5, 6):
        return
    pdf = _mix_panel(seed)
    twin = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_domain_mixture_deadletter"].oracle
    ))
    raising = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_domain_mixture"].oracle
    ))
    assert [dict(r, n_deadletter=0) for r in raising] == twin
    twin_e = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_data_epochs_deadletter"].oracle
    ))
    raising_e = _rows(_duck(
        {"documents": pdf}, QUERIES["pipe_data_epochs"].oracle
    ))
    assert [dict(r, n_deadletter=0) for r in raising_e] == twin_e


@pytest.mark.parametrize("seed", SPARK_SEEDS)
@pytest.mark.parametrize(
    "name", ["pipe_domain_mixture_deadletter", "pipe_data_epochs_deadletter"]
)
def test_fuzz_mixture_spark(spark, tmp_path, seed, name):
    pdf = _mix_panel(seed)
    ref = (_mixture_ref if "mixture" in name else _epochs_ref)(pdf)
    df = _spark_run(
        spark, tmp_path, seed, name, {"documents": pdf},
        {"documents": _DOC_SCHEMA},
    )
    got = [
        {k: (v if isinstance(v, str) else int(v)) for k, v in r.asDict().items()}
        for r in df.collect()
    ]
    assert got == ref

"""Round-11 mixture-family dead-letter twins (VERDICT r10 item 3) and
the new zero-mass guards on their raising forms. Pins:
(a) guard: pipe_domain_mixture / pipe_data_epochs raise the SAME named
    error on BOTH engines when a mixture language's documents sum to
    zero/NULL chars (previously DuckDB // 0 silently NULLed while
    Spark ANSI div raised — the r10 fuzz drift class),
(b) twin == raising form (+ all-zero n_deadletter) on the clean
    harness corpus,
(c) twin == its DuckDB oracle on the DIRTY corpus where the raising
    form aborts,
(d) the dead side is counted per language, an all-dirty language stays
    visible with sentinel -1 rate/epochs, and out-of-mixture languages
    are out of SCOPE (neither planned nor dead-lettered)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

import duckdb

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES
from tests.oracle_utils import canonicalize, compare

SF = "/root/testdata/sf0.001"

# fr: ALL zero/NULL chars (the guard trigger); en: one dirty row in a
# clean language; xx: out-of-mixture (must be ignored, not rejected)
DIRTY_DOCS = [
    (0, "en", "web", 120),
    (1, "en", "web", None),
    (2, "en", "web", 80),
    (3, "de", "web", 60),
    (4, "es", "web", 70),
    (5, "zh", "web", 90),
    (6, "fr", "web", 0),
    (7, "fr", "web", None),
    (8, "xx", "web", 0),
]


def _write_dirty(spark, path: str) -> None:
    spark.createDataFrame(
        [(d, f"doc {d}", lang, src, n) for d, lang, src, n in DIRTY_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


def _oracle_on(sf_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "documents.parquet", "*.parquet")
            )
        )
        return con.execute(QUERIES[name].oracle).fetchdf()
    finally:
        con.close()


@pytest.mark.parametrize(
    "name", ["pipe_domain_mixture", "pipe_data_epochs"]
)
def test_raising_forms_raise_identically_on_zero_mass_lang(
    spark, tmp_path, name
):
    sf_dir = str(tmp_path)
    _write_dirty(spark, sf_dir)
    with pytest.raises(Exception, match=name):
        get_queries()[name](spark, sf_dir).collect()
    with pytest.raises(Exception, match=name):
        _oracle_on(sf_dir, name)


@pytest.mark.parametrize(
    "name", ["pipe_domain_mixture", "pipe_data_epochs"]
)
def test_twin_equals_raising_form_on_clean_corpus(spark, name):
    raising = get_queries()[name](spark, SF).collect()
    twin = get_queries()[f"{name}_deadletter"](spark, SF).collect()
    assert all(r["n_deadletter"] == 0 for r in twin)
    cols = [c for c in raising[0].asDict()]
    assert sorted(tuple(r[c] for c in cols) for r in raising) == sorted(
        tuple(r[c] for c in cols) for r in twin
    )


@pytest.mark.parametrize(
    "name",
    ["pipe_domain_mixture_deadletter", "pipe_data_epochs_deadletter"],
)
def test_twin_oracle_parity_on_dirty_corpus(spark, tmp_path, name):
    sf_dir = str(tmp_path)
    _write_dirty(spark, sf_dir)
    spark_pdf = canonicalize(
        pd.DataFrame(
            [r.asDict() for r in get_queries()[name](spark, sf_dir).collect()]
        )
    )
    oracle_pdf = canonicalize(_oracle_on(sf_dir, name))
    assert compare(spark_pdf, oracle_pdf) == []


def test_dirty_corpus_dead_side_counted_and_scope_respected(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_dirty(spark, sf_dir)
    rows = {
        r["lang"]: r
        for r in get_queries()["pipe_data_epochs_deadletter"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"en", "de", "es", "fr", "zh"}  # xx out of scope
    assert rows["fr"]["n_deadletter"] == 2
    assert rows["fr"]["avail_chars"] == 0
    assert rows["fr"]["epochs_x1e6"] == -1  # sentinel, not an abort
    assert rows["fr"]["unmet_chars"] == rows["fr"]["target_chars"]
    assert rows["en"]["n_deadletter"] == 1  # the NULL row, counted not lost
    assert rows["en"]["avail_chars"] == 200

    mix = {
        r["lang"]: r
        for r in get_queries()["pipe_domain_mixture_deadletter"](
            spark, sf_dir
        ).collect()
    }
    # fr's empty supply binds the water-fill: exact mixture unsatisfiable
    assert mix["fr"]["rate_x1e6"] == -1
    assert all(r["take_chars"] == 0 for r in mix.values())


def test_epochs_twin_matches_pure_python_reference(spark, tmp_path):
    """Independent staged-integer reference (the gate checklist's
    third-engine check): recompute the dirty-corpus epoch plan with
    plain Python ints — trunc division is // on non-negative values."""
    sf_dir = str(tmp_path)
    _write_dirty(spark, sf_dir)
    mix_w = {"en": 400_000, "de": 150_000, "fr": 150_000,
             "es": 150_000, "zh": 150_000}
    clean = {}
    dead = {}
    for _, lang, _, n in DIRTY_DOCS:
        if lang not in mix_w:
            continue
        if n is not None and n >= 1:
            clean[lang] = clean.get(lang, 0) + n
        else:
            dead[lang] = dead.get(lang, 0) + 1
    total = 2 * sum(clean.values())
    want = {}
    for lang, w in mix_w.items():
        avail = clean.get(lang, 0)
        target = (total * w) // 1_000_000
        granted = min(target, 4 * avail)
        epochs = -1 if avail == 0 else (granted * 1_000_000) // avail
        unmet = max(0, target - 4 * avail)
        want[lang] = (avail, target, granted, epochs, unmet,
                      dead.get(lang, 0))
    got = {
        r["lang"]: (r["avail_chars"], r["target_chars"],
                    r["granted_chars"], r["epochs_x1e6"],
                    r["unmet_chars"], r["n_deadletter"])
        for r in get_queries()["pipe_data_epochs_deadletter"](
            spark, sf_dir
        ).collect()
    }
    assert got == want

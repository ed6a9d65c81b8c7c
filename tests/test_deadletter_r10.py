"""Round-10 dead-letter twins (VERDICT r9 #1): the raising forms of
pipe_quality_budget_cut / pipe_percentile_prune stay the certified
abort-on-bad-row queries; the *_deadletter twins route empty documents
through audit.dead_letter_rows (§2.9, the reference's drop-rows-never-
runs semantics) instead. Pins: (a) twin == raising form on a clean
corpus, (b) twin == its DuckDB oracle on a DIRTY corpus where the
raising form aborts, (c) the dead side is counted, not lost."""

from __future__ import annotations

import os

import pandas as pd
import pytest

import duckdb

from p6_spark.plans import get_queries
from p6_spark.plans.registry import QUERIES
from tests.oracle_utils import canonicalize, compare

SF = "/root/testdata/sf0.001"

DIRTY_DOCS = [
    (0, "a normal document with words", "en", "web", 28),
    (1, "   ", "en", "web", 3),  # whitespace-only -> zero tokens
    (2, "another fine document here", "en", "web", 26),
    (3, "", "de", "web", 0),  # empty string -> zero tokens
    (4, "ein gutes deutsches dokument", "de", "web", 28),
    (5, "\t\n ", "fr", "web", 3),  # lang with ONLY empty docs
]


def _write_dirty(spark, path: str) -> None:
    spark.createDataFrame(
        DIRTY_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


def test_budget_cut_twin_equals_raising_form_on_clean_corpus(spark):
    """selected=true/false relabeled 'selected'/'cut'; zero deadletter
    rows on the harness corpus (it has no empty documents)."""
    raising = get_queries()["pipe_quality_budget_cut"](spark, SF).collect()
    twin = get_queries()["pipe_quality_budget_cut_deadletter"](
        spark, SF
    ).collect()
    assert not [r for r in twin if r["status"] == "deadletter"]
    relabel = {True: "selected", False: "cut"}
    want = sorted(
        (relabel[r["selected"]], r["lang"], r["n_docs"], r["n_tokens"],
         r["min_qscore_x1e6"])
        for r in raising
    )
    got = sorted(
        (r["status"], r["lang"], r["n_docs"], r["n_tokens"],
         r["min_qscore_x1e6"])
        for r in twin
    )
    assert got == want


def test_percentile_prune_twin_equals_raising_form_on_clean_corpus(spark):
    raising = get_queries()["pipe_percentile_prune"](spark, SF).collect()
    twin = get_queries()["pipe_percentile_prune_deadletter"](
        spark, SF
    ).collect()
    assert all(r["n_deadletter"] == 0 for r in twin)
    cols = (
        "lang", "n_docs", "tok_total", "threshold_x1e6",
        "n_dropped", "n_kept", "tok_dropped",
    )
    assert sorted(tuple(r[c] for c in cols) for r in raising) == sorted(
        tuple(r[c] for c in cols) for r in twin
    )


@pytest.mark.parametrize(
    "name",
    ["pipe_quality_budget_cut_deadletter", "pipe_percentile_prune_deadletter"],
)
def test_twin_oracle_parity_on_dirty_corpus(spark, tmp_path, name):
    """On the corpus that ABORTS the raising forms, the twin runs on
    both engines and matches exactly (the driver's t2 canonicalization)."""
    sf_dir = str(tmp_path)
    _write_dirty(spark, sf_dir)
    raising = name.removesuffix("_deadletter")
    with pytest.raises(Exception, match=raising):
        get_queries()[raising](spark, sf_dir).collect()

    spark_pdf = canonicalize(
        pd.DataFrame(
            [r.asDict() for r in get_queries()[name](spark, sf_dir).collect()]
        )
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "documents.parquet", "*.parquet")
            )
        )
        oracle_pdf = canonicalize(con.execute(QUERIES[name].oracle).fetchdf())
    finally:
        con.close()
    assert compare(spark_pdf, oracle_pdf) == []


def test_dirty_corpus_dead_side_is_counted_not_lost(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_dirty(spark, sf_dir)
    twin = {
        (r["status"], r["lang"]): r
        for r in get_queries()["pipe_quality_budget_cut_deadletter"](
            spark, sf_dir
        ).collect()
    }
    assert twin[("deadletter", "en")]["n_docs"] == 1
    assert twin[("deadletter", "de")]["n_docs"] == 1
    assert twin[("deadletter", "fr")]["n_docs"] == 1  # lang with ONLY empties
    prune = {
        r["lang"]: r
        for r in get_queries()["pipe_percentile_prune_deadletter"](
            spark, sf_dir
        ).collect()
    }
    # fr has ONLY empty docs: zero mass, -1 sentinel, still present
    assert prune["fr"]["n_docs"] == 0
    assert prune["fr"]["threshold_x1e6"] == -1
    assert prune["fr"]["n_deadletter"] == 1
    assert prune["en"]["n_deadletter"] == 1 and prune["en"]["n_docs"] == 2


# ---------------------------------------------------------------------------
# pipe_sequence_packing_deadletter
# ---------------------------------------------------------------------------


def test_packing_twin_equals_raising_form_on_clean_corpus(spark):
    raising = get_queries()["pipe_sequence_packing"](spark, SF).collect()
    twin = get_queries()["pipe_sequence_packing_deadletter"](
        spark, SF
    ).collect()
    assert sorted(tuple(r) for r in raising) == sorted(
        tuple(r) for r in twin
    )  # no sentinel row on a clean corpus


def test_packing_twin_routes_empty_docs(spark, tmp_path):
    """n_chars = 0 and NULL rows abort the raising form; the twin packs
    the clean stream and reports them as the docs_in_seq = -1 row."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(0, 2000), (1, 0), (2, 3000), (3, None), (4, 2500)],
        "doc_id long, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    with pytest.raises(Exception, match="pipe_sequence_packing"):
        get_queries()["pipe_sequence_packing"](spark, sf_dir).collect()

    rows = {
        r["docs_in_seq"]: r
        for r in get_queries()["pipe_sequence_packing_deadletter"](
            spark, sf_dir
        ).collect()
    }
    assert rows[-1]["n_seqs"] == 2 and rows[-1]["n_straddlers"] == 0
    # the clean stream packed: 2000+3000+2500 chars over 4096-char windows
    assert sum(r["n_seqs"] for k, r in rows.items() if k != -1) >= 1

    # and the SAME oracle certifies the twin on the dirty panel
    spark_pdf = canonicalize(
        pd.DataFrame(
            [
                r.asDict()
                for r in get_queries()["pipe_sequence_packing_deadletter"](
                    spark, sf_dir
                ).collect()
            ]
        )
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "documents.parquet", "*.parquet")
            )
        )
        oracle_pdf = canonicalize(
            con.execute(
                QUERIES["pipe_sequence_packing_deadletter"].oracle
            ).fetchdf()
        )
    finally:
        con.close()
    assert compare(spark_pdf, oracle_pdf) == []

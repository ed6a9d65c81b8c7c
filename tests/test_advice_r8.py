"""Round-9 gates for the three ADVICE-r8 items: the _jaccard_scored
INT32 shingle-count overflow (medium), the ml_pass_at_k decimal(38,0)
product ceiling (now a loud identical raise in both engines), and the
ml_bt_strength zero-strength denominator (now floored at 1 in both
engines so degenerate win rates stay cross-engine identical).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# _jaccard_scored: F.size is INT32 — long documents must not overflow
# ---------------------------------------------------------------------------


def _write_long_doc_corpus(spark, path: str, n_words: int = 2400) -> None:
    """Two identical documents of n_words DISTINCT words each: > 2147
    distinct 3-word shingles, so the old `n_common * 1000000` INT32
    product overflows (2398 * 1e6 > 2^31 - 1). Identical texts share
    every MinHash band, so the pair is guaranteed a candidate."""
    text = " ".join(f"w{i}" for i in range(n_words))
    spark.createDataFrame(
        [(0, text, len(text)), (1, text, len(text))],
        "doc_id long, text string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


def test_jaccard_scored_survives_int32_shingle_overflow(spark, tmp_path):
    """ADVICE r8 (medium): a document with > 2147 distinct 3-word
    shingles (~2.1k words — routine in real corpora) overflowed the
    INT32 product in the Spark side of _jaccard_scored while the DuckDB
    twin's len() is BIGINT. After the bigint staging, two identical
    2400-word documents must score exactly jaccard = 1.0 (x1e6) in BOTH
    engines."""
    from p6_spark.plans.curation_r8 import _jaccard_scored, _sql_jaccard_scored

    sf_dir = str(tmp_path)
    _write_long_doc_corpus(spark, sf_dir)

    rows = _jaccard_scored(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0]["id_a"] == 0 and rows[0]["id_b"] == 1
    assert rows[0]["jaccard_x1e6"] == 1_000_000

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "documents.parquet", "*.parquet")
            )
        )
        oracle = con.execute(
            f"WITH {_sql_jaccard_scored()} "
            "SELECT id_a, id_b, jaccard_x1e6 FROM scored ORDER BY id_a, id_b"
        ).fetchall()
    finally:
        con.close()
    assert oracle == [(0, 1, 1_000_000)]

    # self-check that this gates a real failure mode: the OLD unstaged
    # INT32 product on the same counts either raises (ANSI, the Spark 4
    # session default) or wraps negative (legacy) — never the right answer
    n_common = 2398  # distinct 3-word shingles of a 2400-distinct-word doc
    try:
        bad = (
            spark.range(1)
            .select(
                F.expr(
                    f"(cast({n_common} as int) * cast(1000000 as int))"
                    f" div {n_common}"
                ).alias("j")
            )
            .collect()[0]["j"]
        )
        assert bad != 1_000_000 and bad < 0
    except Exception:
        pass  # ANSI ARITHMETIC_OVERFLOW: equally a loud failure


# ---------------------------------------------------------------------------
# ml_pass_at_k: past the decimal(38,0) ceiling BOTH engines raise loudly
# ---------------------------------------------------------------------------


def test_pass_at_k_raises_identically_past_decimal_ceiling(spark):
    """ADVICE r8: n^5 x 1e6 exceeds decimal(38,0) past n ~= 2.51e6 —
    Spark non-ANSI decimal overflow NULLs silently (sum() skips, count()
    keeps: corrupted mean) while DuckDB HUGEINT raises later. Both
    engines must now raise AT the documented _PASS_N_MAX bound."""
    from p6_spark.plans.eval_r8 import _PASS_N_MAX, _pass_sql

    over = spark.createDataFrame(
        [(_PASS_N_MAX + 1, 100)], "n long, c long"
    )
    with pytest.raises(Exception, match="decimal\\(38,0\\) product ceiling"):
        over.select(F.expr(_pass_sql(5, "spark")).alias("p")).collect()

    con = duckdb.connect()
    try:
        with pytest.raises(Exception, match="decimal\\(38,0\\) product ceiling"):
            con.execute(
                f"SELECT {_pass_sql(5, 'duck')} AS p FROM "
                f"(VALUES ({_PASS_N_MAX + 1}::BIGINT, 100::BIGINT)) t(n, c)"
            ).fetchall()
    finally:
        con.close()


def test_pass_at_k_exact_at_the_ceiling(spark):
    """AT n = _PASS_N_MAX the guarded expression still computes the exact
    integer, identical across engines (the guard must not clip the legal
    domain). c=0 gives pass@5 = 0; c=n gives 1e6; and a hand-checkable
    middle case pins the telescoped product."""
    from p6_spark.plans.eval_r8 import _PASS_N_MAX, _pass_sql

    panel = [
        (_PASS_N_MAX, 0),
        (_PASS_N_MAX, _PASS_N_MAX),
        (10, 5),
    ]
    got = (
        spark.createDataFrame(panel, "n long, c long")
        .select("n", "c", F.expr(_pass_sql(5, "spark")).alias("p"))
        .orderBy("n", "c")
        .collect()
    )
    con = duckdb.connect()
    try:
        values = ", ".join(f"({n}::BIGINT, {c}::BIGINT)" for n, c in panel)
        oracle = con.execute(
            f"SELECT n, c, {_pass_sql(5, 'duck')} AS p"
            f" FROM (VALUES {values}) t(n, c) ORDER BY n, c"
        ).fetchall()
    finally:
        con.close()
    assert [(r["n"], r["c"], r["p"]) for r in got] == [tuple(r) for r in oracle]
    by_nc = {(r["n"], r["c"]): r["p"] for r in got}
    assert by_nc[(_PASS_N_MAX, 0)] == 0
    assert by_nc[(_PASS_N_MAX, _PASS_N_MAX)] == 1_000_000
    # n=10, c=5, k=5: C(5,5)/C(10,5) = 1/252 -> 1e6 - 1e6//252 = 996032
    assert by_nc[(10, 5)] == 1_000_000 - 1_000_000 // 252


# ---------------------------------------------------------------------------
# ml_bt_strength: degenerate win rates must stay cross-engine identical
# ---------------------------------------------------------------------------

_BT_DEGENERATE = [
    # (t, opp, n_games, wins): A and B each win 2 of 3M games vs C and
    # split 2 head-to-head games. w1_A = 3e12 div (1.5e18 + 1e6) = 0
    # before the floor — the (A,B) second-iteration denominator was 0.
    ("A", "C", 3_000_000, 2),
    ("C", "A", 3_000_000, 2_999_998),
    ("B", "C", 3_000_000, 2),
    ("C", "B", 3_000_000, 2_999_998),
    ("A", "B", 2, 1),
    ("B", "A", 2, 1),
]

_BT_SQL_TWIN = """
WITH sided AS (SELECT * FROM (VALUES {values}) v(t, opp, n_games, wins)),
totals AS (
  SELECT t, cast(sum(wins) AS bigint) AS w_total,
         cast(sum(n_games) AS bigint) AS games
  FROM sided GROUP BY t
),
s1 AS (
  SELECT t, sum((n_games::HUGEINT * 1000000000000) // 2000000) AS s1
  FROM sided GROUP BY t
),
w1 AS (
  SELECT tt.t,
         cast(greatest(1, (tt.w_total::HUGEINT * 1000000000000) // s1.s1)
              AS bigint) AS w1_x1e6
  FROM totals tt JOIN s1 ON s1.t = tt.t
),
w2 AS (
  SELECT s.t,
         cast((tt.w_total::HUGEINT * 1000000000000)
              // sum((s.n_games::HUGEINT * 1000000000000)
                     // (wa.w1_x1e6 + wb.w1_x1e6)) AS bigint) AS w2_x1e6
  FROM sided s
  JOIN w1 wa ON wa.t = s.t
  JOIN w1 wb ON wb.t = s.opp
  JOIN totals tt ON tt.t = s.t
  GROUP BY s.t, tt.w_total
)
SELECT tt.t AS event_type, tt.w_total AS wins, tt.games,
       w1.w1_x1e6, w2.w2_x1e6
FROM totals tt JOIN w1 ON w1.t = tt.t JOIN w2 ON w2.t = tt.t
ORDER BY event_type
"""


def test_bt_strength_degenerate_win_rate_is_cross_engine_identical(spark):
    """ADVICE r8: two types whose win rate truncates w1 to 0 zeroed the
    second-iteration denominator (w_a + w_b) — DuckDB // raised while
    Spark div returned NULL and silently dropped the term. With the
    greatest(1, w1) floor both engines compute identical, non-NULL
    strengths on the degenerate panel."""
    from p6_spark.plans.eval_r8 import _bt_mm

    sided = spark.createDataFrame(
        _BT_DEGENERATE, "t string, opp string, n_games long, wins long"
    )
    got = [
        (r["event_type"], r["wins"], r["games"], r["w1_x1e6"], r["w2_x1e6"])
        for r in _bt_mm(sided).collect()
    ]
    assert all(v is not None for row in got for v in row), got

    con = duckdb.connect()
    try:
        values = ", ".join(
            f"('{t}', '{o}', {n}::BIGINT, {w}::BIGINT)"
            for t, o, n, w in _BT_DEGENERATE
        )
        oracle = [
            tuple(r)
            for r in con.execute(
                _BT_SQL_TWIN.format(values=values)
            ).fetchall()
        ]
    finally:
        con.close()
    assert got == oracle

    # the floor engaged: A and B's raw w1 truncates to 0 on this panel
    w1 = {t: v for t, _, _, v, _ in got}
    assert w1["A"] == 1 and w1["B"] == 1

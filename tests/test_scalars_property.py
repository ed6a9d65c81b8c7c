"""Property-based cross-checks: the Column-expression scalars must agree
with straight-line Python references of the P6 semantics (reference
src/P6/mapper.py:196-235) on arbitrary inputs, not just the truth
tables. One Spark job per hypothesis example (inputs batched as rows).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from p6_spark.functions.scalars import normalize_time_like, to_bool

_TRUTHY = {"1", "true", "t", "yes", "y"}
_FALSY = {"0", "false", "f", "no", "n", ""}


def ref_to_bool(v: str | None) -> bool:
    # reference src/P6/mapper.py:218-235. None models a missing workbook
    # cell, which pandas hands the reference as NaN: str 'nan' is in
    # neither set and bool(float('nan')) is True.
    if v is None:
        return True
    s = v.strip().lower()
    if s in _TRUTHY:
        return True
    if s in _FALSY:
        return False
    return len(s) > 0


def ref_normalize_time_like(v: str | None) -> str:
    # reference src/P6/mapper.py:196-216 (string path; numeric handled
    # via the int-parse branch)
    if v is None:
        return ""
    s = v.strip()
    if s == "":
        return ""
    try:
        return f"T{int(s)}"
    except ValueError:
        pass
    if s[0] in ("T", "t"):
        return s
    return f"T{s}"


# printable-ish strings incl. the tricky classes: signs, spaces, T
# prefixes, digits, unicode spaces are excluded (pandas strips ASCII
# whitespace only — mirrored by Spark trim)
_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.sampled_from(list("Tt01789+- yYnNoOeEfF.xyzXYZ")),
        max_size=12,
    ),
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(_text, min_size=1, max_size=40))
@_SETTINGS
def test_to_bool_matches_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = [r["y"] for r in df.select(to_bool(F.col("x")).alias("y")).collect()]
    assert got == [ref_to_bool(v) for v in vals]


@given(vals=st.lists(_text, min_size=1, max_size=40))
@_SETTINGS
def test_normalize_time_like_matches_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = [
        r["y"] for r in df.select(normalize_time_like(F.col("x")).alias("y")).collect()
    ]
    assert got == [ref_normalize_time_like(v) for v in vals]


def test_trunc_div_matches_spark_and_duckdb():
    """The fixed-point family's cross-engine foundation: Python
    _trunc_div == Spark `div` == DuckDB `//` on signed bigints."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from p6_spark.operators.ivf import _trunc_div

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        s=st.integers(min_value=-(2**40), max_value=2**40),
        n=st.integers(min_value=1, max_value=2**20),
    )
    def check(s, n):
        duck = con.execute(
            "select cast(? as bigint) // cast(? as bigint)", [s, n]
        ).fetchone()[0]
        assert _trunc_div(s, n) == duck

    check()


def test_trunc_div_matches_spark_div(spark):
    import random

    from pyspark.sql import functions as F

    from p6_spark.operators.ivf import _trunc_div

    rng = random.Random(42)
    rows = [(rng.randint(-(2**40), 2**40), rng.randint(1, 2**20)) for _ in range(500)]
    df = spark.createDataFrame(rows, "s long, n long")
    got = df.select(F.expr("s div n").alias("q"), "s", "n").collect()
    for r in got:
        assert r["q"] == _trunc_div(r["s"], r["n"])

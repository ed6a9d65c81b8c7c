"""Scalar-function truth tables — mirrors reference tests/test_mapper_utils.py
(normalize_time_like, to_bool) plus HPO/HGVS parsing cases from
tests/test_mapper_parse_*.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p6_spark.functions.hgvs import hgvs_c_parts, hgvs_g_normalize
from p6_spark.functions.hpo import hpo_curie, hpo_label
from p6_spark.functions.scalars import (
    canonical_chromosome,
    email_or_default,
    normalize_time_like,
    to_bool,
)


def apply_one(spark, fn, value):
    df = spark.createDataFrame([(value,)], "x string")
    return df.select(fn(F.col("x")).alias("y")).collect()[0]["y"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        (None, ""),
        ("", ""),
        ("   ", ""),
        ("0", "T0"),
        ("2020", "T2020"),
        ("20200101", "T20200101"),
        ("T0", "T0"),
        ("t5", "t5"),
        ("visit3", "Tvisit3"),
    ],
)
def test_normalize_time_like(spark, raw, expected):
    assert apply_one(spark, normalize_time_like, raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1", True),
        ("true", True),
        ("YES", True),
        ("y", True),
        ("0", False),
        ("false", False),
        ("no", False),
        ("", False),
        # null = missing workbook cell = pandas NaN in the reference, and
        # str(nan)="nan" falls through to bool(nan) which is True
        (None, True),
        # truthiness fallback — the real-workbook semantic (SURVEY §5.3)
        ("O", True),
        ("E", True),
        ("Phased", True),
        ("Unphased", True),
    ],
)
def test_to_bool_with_truthiness_fallback(spark, raw, expected):
    assert apply_one(spark, to_bool, raw) is expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("user@example.com", "user@example.com"),
        # only a genuinely missing cell (pd.isna) gets the default —
        # the reference keeps ''/'nan' strings and the email-format
        # constraint later rejects the row (src/P6/mapper.py:272-276)
        (None, "unknown@example.com"),
        ("", ""),
        ("nan", "nan"),
    ],
)
def test_email_or_default(spark, raw, expected):
    assert apply_one(spark, email_or_default, raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("16", "chr16"), ("chr16", "chr16"), ("CHRX", "CHRX"), ("X", "chrX"), (None, None)],
)
def test_canonical_chromosome(spark, raw, expected):
    assert apply_one(spark, canonical_chromosome, raw) == expected


@pytest.mark.parametrize(
    "raw,label,curie",
    [
        ("HP:0000510", "", "HP:0000510"),
        ("HP:510", "", "HP:0000510"),
        ("1636", "", "HP:0001636"),
        ("hp 0100753", "", "HP:0100753"),
        ("Rod-cone dystrophy HP:0000510 ", "Rod-cone dystrophy", "HP:0000510"),
        ("Some label (HP:510)", "Some label", "HP:0000510"),
        ("??", "", None),
    ],
)
def test_hpo_parse(spark, raw, label, curie):
    df = spark.createDataFrame([(raw,)], "x string")
    row = df.select(
        hpo_label(F.col("x")).alias("l"), hpo_curie(F.col("x")).alias("c")
    ).collect()[0]
    assert row["l"] == label
    assert row["c"] == curie


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("chr16:g.100A>G", "16:g.100A>G"),
        ("16:g.100a>g", "16:g.100A>G"),
        ("chr16:g.16177614C>T", "16:g.16177614C>T"),
        ("chrX:g.123del", "X:g.123del"),  # non-SNV: only 'chr' stripped
    ],
)
def test_hgvs_g_normalize(spark, raw, expected):
    assert apply_one(spark, hgvs_g_normalize, raw) == expected


def test_hgvs_c_parts(spark):
    df = spark.createDataFrame([("ENST00000205557.12:c.2428G>A",)], "x string")
    tx, c = hgvs_c_parts(F.col("x"))
    row = df.select(tx.alias("t"), c.alias("c")).collect()[0]
    assert row["t"] == "ENST00000205557.12"
    assert row["c"] == "c.2428G>A"

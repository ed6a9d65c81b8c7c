"""FrequencyModifier stub (F13) — mirrors the reference's
tests/test_periodicity.py plus the in-plan Column twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p6_spark.functions.periodicity import (
    FrequencyModifier,
    Periodicity,
    frequency_modifier_col,
)


def test_frequency_modifier_from_label():
    assert FrequencyModifier.from_label("Obligate") == FrequencyModifier.OBLIGATE
    assert (
        FrequencyModifier.from_label("very frequent")
        == FrequencyModifier.VERY_FREQUENT
    )
    # parenthesized/cased variants normalize too
    assert FrequencyModifier.from_label(" Very rare ") == FrequencyModifier.VERY_RARE
    assert FrequencyModifier.from_label("(Excluded)") == FrequencyModifier.EXCLUDED


def test_frequency_modifier_invalid_label_raises():
    with pytest.raises(ValueError):
        FrequencyModifier.from_label("Sometimes")


def test_periodicity_wrapper_stores_enum():
    periodicity = Periodicity(frequency_modifier=FrequencyModifier.FREQUENT)
    assert isinstance(periodicity.frequency_modifier, FrequencyModifier)


def test_frequency_modifier_col_matches_driver_side(spark):
    labels = ["Obligate", "very frequent", "Frequent", "Occasional",
              " Very rare ", "(Excluded)"]
    df = spark.createDataFrame([(s,) for s in labels], "label string")
    got = [
        r[0]
        for r in df.select(frequency_modifier_col(F.col("label"))).collect()
    ]
    want = [FrequencyModifier.from_label(s).name for s in labels]
    assert got == want


def test_frequency_modifier_col_unknown_label_raises(spark):
    df = spark.createDataFrame([("Sometimes",)], "label string")
    with pytest.raises(Exception, match="Unknown frequency modifier"):
        df.select(frequency_modifier_col(F.col("label"))).collect()

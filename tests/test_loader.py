"""Loader tests: header normalization rules, rename map, alias
resolution, sheet classification (reference src/P6/loader.py +
tests/test_mapper_choose_aliases.py + tests/test_preprocess.py)."""

from __future__ import annotations

import pytest

from p6_spark.loader import choose_named_tables, normalize_columns, normalize_header
from p6_spark.schemas import classify_sheet


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Searchable Patient ID", "searchable_patient_id"),
        ("Status (observed/excluded)", "status"),
        ("  HPO  ", "hpo"),
        ("Parent of Origin", "parent_of_origin"),
        ("Time: stamp", "time_stamp"),
        ("CHROM", "chrom"),
    ],
)
def test_normalize_header(raw, expected):
    assert normalize_header(raw) == expected


def test_rename_map_applied(spark):
    df = spark.createDataFrame(
        [("1", "2", "3", "4", "5", "6", "7")],
        "`ref` string, `alt` string, `gene` string, `start` string, `end` string, "
        "`CHROM` string, `HPO Term` string",
    )
    out = normalize_columns(df)
    assert out.columns == [
        "reference", "alternate", "gene_symbol", "start_position", "end_position",
        "chromosome", "hpo_id",
    ]


def test_alias_resolution(spark):
    df = spark.createDataFrame([("x",)], "a string")
    chosen, errors = choose_named_tables({"Variants": df, "hpo": df, "LABS ": df})
    assert set(chosen) == {"genotype", "phenotype", "measurements"}
    assert errors == []


def test_missing_both_core_sheets_is_error(spark):
    df = spark.createDataFrame([("x",)], "a string")
    chosen, errors = choose_named_tables({"junk": df})
    assert chosen == {}
    assert errors


@pytest.mark.parametrize(
    "cols,kind",
    [
        (
            ["contact_email", "phasing", "chromosome", "start_position", "end_position",
             "reference", "alternate"],
            "genotype",
        ),
        (["contact_email", "phasing", "hgvsg"], "genotype"),
        (["hpo_id", "date_of_observation", "status"], "phenotype"),
        (["disease_term", "disease_onset"], "diseases"),
        (["measurement_type", "measurement_value", "measurement_unit"], "measurements"),
        (["biosample_id", "biosample_type", "collection_date"], "biosamples"),
        (["note"], "skip"),  # the 'severity periodicity' to-be-designed sheet
    ],
)
def test_classify_sheet(cols, kind):
    assert classify_sheet(cols) == kind

"""Packet assembly end-to-end — mirrors reference
tests/test_mapper_apply_construct.py (1-patient golden assertions) and
tests/test_full_features.py (all five blocks present)."""

from __future__ import annotations

import json

from p6_spark.loader import normalize_columns
from p6_spark.mapper import apply_mapping


def wb(spark, sheets: dict[str, tuple[list[str], list[tuple]]]):
    out = {}
    for name, (header, rows) in sheets.items():
        df = spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in header))
        out[name] = normalize_columns(df)
    return out


GENO_HEADER = [
    "Searchable Patient ID", "Contact Email", "Phasing", "chrom", "start", "end",
    "ref", "alt", "gene", "hgvsg", "hgvsc", "hgvsp", "zygosity", "inheritance",
]
PHENO_HEADER = ["Patient ID", "HPO", "Timestamp", "Status (observed/excluded)"]


def one_patient_tables(spark):
    return wb(
        spark,
        {
            "genotype": (
                GENO_HEADER,
                [
                    (
                        "XXXXYYYY1", "u@example.com", "1", "16", "100", "100", "A", "G",
                        "ABCC6", "chr16:g.100A>G", "NM_000000.0:c.100A>G",
                        "NP_000000.0:p.Lys67Asn", "het", "inherited",
                    )
                ],
            ),
            "phenotype": (PHENO_HEADER, [("XXXXYYYY1", "HP:510", "T0", "O")]),
        },
    )


def test_one_patient_end_to_end(spark):
    result = apply_mapping(spark, one_patient_tables(spark))
    stats = result.stats()
    assert stats == {"n_genotype": 1, "n_phenotype": 1, "n_patients": 1}

    pkt = json.loads(result.packets.toJSON().collect()[0])
    assert pkt["id"] == "XXXXYYYY1"
    assert pkt["subject"]["id"] == "XXXXYYYY1"
    # HPO CURIE normalized (HP:510 -> HP:0000510)
    assert pkt["phenotypicFeatures"][0]["type"]["id"] == "HP:0000510"
    # interpretation id per-patient ordinal + normalized g.HGVS expression
    interp = pkt["interpretations"][0]
    assert interp["id"] == "XXXXYYYY1-interpretation-0"
    assert interp["progressStatus"] == "COMPLETED"
    gi = interp["diagnosis"]["genomicInterpretations"][0]
    assert gi["subjectOrBiosampleId"] == "XXXXYYYY1"
    assert gi["interpretationStatus"] == "CONTRIBUTORY"
    vd = gi["variantInterpretation"]["variationDescriptor"]
    assert vd["expressions"][0]["value"] == "16:g.100A>G"
    assert vd["allelicState"] == {"id": "GENO:0000135", "label": "heterozygous"}
    assert vd["geneContext"]["symbol"] == "ABCC6"


def test_excluded_feature_flag(spark):
    tables = wb(
        spark,
        {
            "phenotype": (
                PHENO_HEADER,
                [("P1", "HP:510", "T0", "0"), ("P1", "HP:511", "T1", "1")],
            )
        },
    )
    result = apply_mapping(spark, tables)
    pkt = json.loads(result.packets.toJSON().collect()[0])
    feats = pkt["phenotypicFeatures"]
    # status False -> excluded: true; status True -> field omitted (proto3)
    assert feats[0]["type"]["id"] == "HP:0000510"
    assert feats[0]["excluded"] is True
    assert "excluded" not in feats[1]


def test_full_feature_packet(spark):
    tables = one_patient_tables(spark)
    tables.update(
        wb(
            spark,
            {
                "diseases": (
                    ["Patient ID", "disease_term", "disease_label", "disease_onset",
                     "disease_status"],
                    [("XXXXYYYY1", "OMIM:266600", "PXE", "2020-01-01", "1")],
                ),
                "labs": (
                    ["Patient ID", "measurement_type", "measurement_value",
                     "measurement_unit"],
                    [("XXXXYYYY1", "LOINC:4548-4", "5.4", "mmol/L")],
                ),
                "samples": (
                    ["Patient ID", "biosample_id", "biosample_type", "collection_date"],
                    [("XXXXYYYY1", "BS1", "UBERON:0002107", "T0")],
                ),
            },
        )
    )
    result = apply_mapping(spark, tables)
    pkt = json.loads(result.packets.toJSON().collect()[0])
    assert pkt["diseases"][0]["term"] == {"id": "OMIM:266600", "label": "PXE"}
    assert pkt["measurements"][0]["type"]["id"] == "LOINC:4548-4"
    assert pkt["biosamples"][0] == {"id": "BS1", "type": {"id": "UBERON:0002107"}}


def test_multi_patient_grouping_and_order(spark):
    tables = wb(
        spark,
        {
            "phenotype": (
                PHENO_HEADER,
                [
                    ("P2", "HP:2", "T0", "O"),
                    ("P1", "HP:1", "T0", "O"),
                    ("P1", "HP:3", "T1", "O"),
                ],
            )
        },
    )
    result = apply_mapping(spark, tables)
    pkts = {p["id"]: p for p in map(json.loads, result.packets.toJSON().collect())}
    assert set(pkts) == {"P1", "P2"}
    # within-patient order preserved via _seq sort keys
    assert [f["type"]["id"] for f in pkts["P1"]["phenotypicFeatures"]] == [
        "HP:0000001",
        "HP:0000003",
    ]


def test_errors_drop_rows_not_run(spark):
    tables = wb(
        spark,
        {
            "genotype": (
                GENO_HEADER,
                [
                    ("GOOD1", "u@example.com", "1", "16", "100", "100", "A", "G", "ABCC6",
                     "16:g.100A>G", "NM_1.1:c.1A>G", "NP_1.1:p.K1N", "het", "inherited"),
                    ("BAD-ID", "u@example.com", "1", "16", "100", "100", "A", "G", "ABCC6",
                     "16:g.100A>G", "NM_1.1:c.1A>G", "NP_1.1:p.K1N", "het", "inherited"),
                ],
            ),
            "phenotype": (PHENO_HEADER, [("GOOD1", "NAD", "T0", "O")]),
        },
    )
    result = apply_mapping(spark, tables)
    assert result.packets.count() == 1  # run survives, bad row dropped
    levels = {a["level"] for a in result.audit.collect()}
    assert levels == {"error", "warning"}


def test_no_genotype_or_phenotype_is_table_error(spark):
    tables = wb(
        spark,
        {"severity periodicity": (["note"], [("to be designed",)])},
    )
    result = apply_mapping(spark, tables)
    assert result.packets.count() == 0
    assert any(
        "No genotype or phenotype sheet" in a["message"] for a in result.audit.collect()
    )

"""A5 ontology validation against the REAL HPO release the reference
ships (hp.v2024-04-26.json.gz), loaded by the stdlib obographs parser —
the same artifact the reference's conftest feeds hpotk
(/root/reference/tests/conftest.py:20-25). No hpotk required.
"""

from __future__ import annotations

import os

import pytest

from p6_spark.sources.ontology import (
    PHENOTYPIC_ABNORMALITY_ROOT,
    ontology_from_obographs,
)

HPO_PATH = "/root/reference/tests/data/hp.v2024-04-26.json.gz"
SYDNEY = "/root/reference/tests/data/Sydney_Python_transformation.xlsx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(HPO_PATH), reason="reference HPO file not available"
)


@pytest.fixture(scope="module")
def hpo(spark):
    return ontology_from_obographs(spark, HPO_PATH).cache()


def test_term_table_shape(hpo):
    n = hpo.count()
    assert n > 18000  # 18,989 CLASS nodes in the 2024-04-26 release
    row = hpo.filter("term_id = 'HP:0000510'").collect()[0]
    assert row["name"] == "Rod-cone dystrophy"
    assert row["is_obsolete"] is False
    assert PHENOTYPIC_ABNORMALITY_ROOT in row["ancestors"]
    # root term has no ancestors
    root = hpo.filter("term_id = 'HP:0000001'").collect()[0]
    assert root["ancestors"] == []


def test_obsolete_terms_carry_alt_ids(hpo):
    obs = hpo.filter("is_obsolete").count()
    assert obs > 400  # 425 deprecated nodes in this release
    # HP:0000057 'obsolete Clitoromegaly' is deprecated in this release
    row = hpo.filter("term_id = 'HP:0000057'").collect()[0]
    assert row["is_obsolete"] is True


def test_sydney_with_real_ontology(spark, hpo):
    from p6_spark.loader import load_workbook
    from p6_spark.mapper import apply_mapping

    tables = load_workbook(spark, SYDNEY)
    res = apply_mapping(spark, tables, ontology=hpo)
    stats = res.stats()
    assert stats["n_genotype"] == 12
    assert stats["n_phenotype"] == 14
    # every HPO ID in the workbook exists and is non-obsolete: no
    # 'not found'/'is obsolete' warnings; NAD warning remains; label
    # checks may fire only where the sheet label differs from HPO's
    msgs = [r["message"] for r in res.audit.collect()]
    assert not any("not found in ontology" in m for m in msgs)
    assert not any("is obsolete" in m for m in msgs)
    assert not any("not a descendant" in m for m in msgs)


def test_propagation_warning_fires_on_ancestor_pair(spark, hpo):
    # HP:0000510 (Rod-cone dystrophy) is a descendant of HP:0000556
    # (Retinal dystrophy): a sheet containing both must warn (A5).
    from p6_spark.operators.phenotype import map_phenotype_table

    df = spark.createDataFrame(
        [
            ("P1", "HP:0000510", "T0", "O"),
            ("P1", "HP:0000556", "T1", "O"),
        ],
        "phenotype_patient_ID string, hpo_id string, timestamp string, status string",
    )
    from p6_spark.loader import normalize_columns

    res = map_phenotype_table(spark, normalize_columns(df), "phenotype", ontology=hpo)
    msgs = [r["message"] for r in res.audit.collect()]
    assert any(
        "propagat" in m.lower() or "redundan" in m.lower() or "ancestor" in m.lower()
        for m in msgs
    ), msgs

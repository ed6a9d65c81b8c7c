"""Ontology as data: the HPO ontology flattened to a DataFrame
``(term_id, name, is_obsolete, alt_term_ids, ancestors)`` so every
ontology check becomes a broadcast join instead of a per-row Python
callback (reference: hpotk MinimalOntology loaded once and consulted
row-by-row, src/P6/mapper.py:380-397,426-440).

At scale the term table is tiny (~18k HPO terms) and broadcasts to every
executor once; validation of a 100 TB phenotype stream is then a
map-side hash join — no Python, no network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PHENOTYPIC_ABNORMALITY_ROOT = "HP:0000118"

ONTOLOGY_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("is_obsolete", T.BooleanType(), False),
        T.StructField("alt_term_ids", T.ArrayType(T.StringType()), True),
        T.StructField("ancestors", T.ArrayType(T.StringType()), True),
    ]
)


def ontology_from_records(spark: SparkSession, records: list[tuple]) -> DataFrame:
    """Build the term table from plain tuples (tests / fixtures)."""
    return spark.createDataFrame(records, ONTOLOGY_SCHEMA)


def ontology_from_hpotk(spark: SparkSession, path: str) -> DataFrame:
    """Flatten an hpotk MinimalOntology (JSON/.json.gz) to the term table.
    Driver-side one-time load (reference src/P6/__main__.py:247-249),
    gated behind import-try — hpotk is optional."""
    try:
        import hpotk
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "hpotk is not installed; build the term table another way "
            "(ontology_from_records) or install hpotk"
        ) from e
    onto = hpotk.load_minimal_ontology(path)
    rows = []
    for term in onto.terms:
        tid = term.identifier.value
        ancestors = [a.value for a in onto.graph.get_ancestors(term.identifier)]
        alt = [a.value for a in term.alt_term_ids]
        rows.append((tid, term.name, bool(term.is_obsolete), alt, ancestors))
    return spark.createDataFrame(rows, ONTOLOGY_SCHEMA)

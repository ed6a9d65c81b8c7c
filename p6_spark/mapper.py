"""End-to-end mapping orchestrator — the reference DefaultMapper.apply_mapping
(src/P6/mapper.py:136-187) as a Spark pipeline:

  choose_named_tables -> five pipelines (each emitting valid + audit) ->
  packet assembly -> stats

Errors drop rows/tables, never the run (§2.9); the combined audit
DataFrame is the second output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from p6_spark.audit import audit_entries, empty_audit, union_audits
from p6_spark.loader import choose_named_tables
from p6_spark.operators.clinical import (
    map_biosample_table,
    map_disease_table,
    map_measurement_table,
)
from p6_spark.operators.genotype import map_genotype_table
from p6_spark.operators.packet import assemble_phenopackets
from p6_spark.operators.phenotype import map_phenotype_table


@dataclass
class MappingResult:
    packets: DataFrame
    audit: DataFrame
    records: dict[str, DataFrame] = field(default_factory=dict)

    def stats(self) -> dict[str, int]:
        """Record counts per kind + distinct patients (reference
        mapper.stats, src/P6/mapper.py:178-185) — one action per kind."""
        out = {f"n_{k}": df.count() for k, df in self.records.items()}
        out["n_patients"] = self.packets.count()
        return out


def apply_mapping(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    ontology: DataFrame | None = None,
    strict_variants: bool = False,
) -> MappingResult:
    chosen, errors = choose_named_tables(tables)
    audits = [empty_audit(spark)]
    if errors:
        audits.append(
            audit_entries(spark, [("choose_tables", "<workbook>", "error", e) for e in errors])
        )

    records: dict[str, DataFrame] = {}

    if "genotype" in chosen:
        r = map_genotype_table(
            spark, chosen["genotype"], "genotype", strict_variants=strict_variants
        )
        records["genotype"], _ = r.valid, audits.append(r.audit)
        # opt-in VV gene-xref enrichment (P6_SPARK_ENRICH_GENE_XREFS=1;
        # identity when off — the reference's own unwired default)
        from p6_spark.sources.vv import enrich_genotypes_with_xrefs

        records["genotype"] = enrich_genotypes_with_xrefs(records["genotype"])
    if "phenotype" in chosen:
        r = map_phenotype_table(spark, chosen["phenotype"], "phenotype", ontology=ontology)
        records["phenotype"], _ = r.valid, audits.append(r.audit)
    if "diseases" in chosen:
        r = map_disease_table(spark, chosen["diseases"], "diseases")
        records["diseases"], _ = r.valid, audits.append(r.audit)
    if "measurements" in chosen:
        r = map_measurement_table(spark, chosen["measurements"], "measurements")
        records["measurements"], _ = r.valid, audits.append(r.audit)
    if "biosamples" in chosen:
        r = map_biosample_table(spark, chosen["biosamples"], "biosamples")
        records["biosamples"], _ = r.valid, audits.append(r.audit)

    packets = assemble_phenopackets(
        spark,
        genotypes=records.get("genotype"),
        phenotypes=records.get("phenotype"),
        diseases=records.get("diseases"),
        measurements=records.get("measurements"),
        biosamples=records.get("biosamples"),
    )
    return MappingResult(packets=packets, audit=union_audits(*audits), records=records)

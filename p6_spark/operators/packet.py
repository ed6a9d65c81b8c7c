"""Phenopacket assembly: the per-patient nested document (J1 + G2).

Reference builds one protobuf Phenopacket per patient by accumulating
dicts-of-lists (src/P6/mapper.py:759-821) and serializing with
MessageToJson. Spark-first this is:

  per-kind groupBy(patient).agg(sort_array(collect_list(struct(...))))
  -> chained full-outer joins on patient_id -> one nested struct column

The only shuffles are the five groupBys + the join, all on patient_id —
co-partitioned by AQE into effectively one exchange. Arrays are sorted by
the pipelines' _seq column so packet contents are deterministic under any
partitioning (collect_list alone is order-nondeterministic).

Field names use protobuf-JSON camelCase (phenotypicFeatures,
progressStatus, ...) so the written JSON matches MessageToJson's shape
(src/P6/__main__.py:200-212). Optional fields are null -> omitted by
Spark's JSON writer, mirroring proto3 default-field omission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6_spark.functions.hgvs import hgvs_g_normalize
from p6_spark.functions.scalars import geno_code_for_zygosity


def _collect_sorted(df: DataFrame, key: str, struct_col, alias: str) -> DataFrame:
    return (
        df.groupBy(F.col(key).alias("patient_id"))
        .agg(F.sort_array(F.collect_list(struct_col)).alias("_tmp"))
        .select(
            "patient_id", F.transform(F.col("_tmp"), lambda s: s["v"]).alias(alias)
        )
    )


def assemble_phenopackets(
    spark: SparkSession,
    genotypes: DataFrame | None = None,
    phenotypes: DataFrame | None = None,
    diseases: DataFrame | None = None,
    measurements: DataFrame | None = None,
    biosamples: DataFrame | None = None,
) -> DataFrame:
    """Full-outer co-group of the five record streams by patient into one
    packet row per patient (reference _group_records_by_patient +
    construct_phenopacket_for_patient, src/P6/mapper.py:759-910)."""
    parts: list[DataFrame] = []

    if phenotypes is not None:
        feat = F.struct(
            F.col("_seq").alias("k"),
            F.struct(
                F.struct(F.col("hpo_id").alias("id")).alias("type"),
                F.when(~F.col("status"), F.lit(True)).alias("excluded"),
            ).alias("v"),
        )
        parts.append(
            _collect_sorted(phenotypes, "phenotype_patient_ID", feat, "phenotypicFeatures")
        )

    if genotypes is not None:
        # Expression carries ONLY {"value": ...}: the reference's
        # _add_hgvs_expression looks up a nonexistent 'HGVS' enum attr on
        # Expression (src/P6/genotype.py:374-376), so syntax is never set
        # and MessageToJson omits the default-valued field. Matching that
        # keeps packet JSON byte-diffable against reference output.
        # geneContext is symbol-only by default (byte-golden vs the
        # reference). When the opt-in VV enrichment ran upstream
        # (sources/vv.enrich_genotypes_with_xrefs, flag
        # P6_SPARK_ENRICH_GENE_XREFS), the hgnc_id/ensembl_gene_id
        # columns are present and fold in as GeneDescriptor valueId /
        # alternateIds — empty xrefs null out so the JSON sink omits
        # them exactly like MessageToJson omits default proto fields.
        if "hgnc_id" in genotypes.columns:
            gene_ctx = F.struct(
                F.nullif(F.col("hgnc_id"), F.lit("")).alias("valueId"),
                F.col("gene_symbol").alias("symbol"),
                F.when(
                    F.col("ensembl_gene_id").isNotNull()
                    & (F.col("ensembl_gene_id") != ""),
                    F.array(F.col("ensembl_gene_id")),
                ).alias("alternateIds"),
            )
        else:
            gene_ctx = F.struct(F.col("gene_symbol").alias("symbol"))
        vd = F.struct(
            F.array(
                F.struct(
                    hgvs_g_normalize(F.col("hgvsg")).alias("value"),
                )
            ).alias("expressions"),
            F.struct(
                geno_code_for_zygosity(F.col("zygosity")).alias("id"),
                F.col("zygosity").alias("label"),
            ).alias("allelicState"),
            gene_ctx.alias("geneContext"),
        )
        gi = F.struct(
            F.col("genotype_patient_ID").alias("subjectOrBiosampleId"),
            F.lit("CONTRIBUTORY").alias("interpretationStatus"),
            F.struct(vd.alias("variationDescriptor")).alias("variantInterpretation"),
        )
        raw = F.struct(F.col("_seq").alias("k"), F.col("_pos").alias("p"), gi.alias("v"))
        # interpretation ids are per-patient ordinal: "{pid}-interpretation-{i}"
        # (reference src/P6/mapper.py:847-849) — posexplode-style index via
        # the sorted collect + transform-with-index.
        collected = (
            genotypes.groupBy(F.col("genotype_patient_ID").alias("patient_id"))
            .agg(F.sort_array(F.collect_list(raw)).alias("_tmp"))
            .select(
                "patient_id",
                F.transform(
                    F.col("_tmp"),
                    lambda s, i: F.struct(
                        F.concat(
                            F.col("patient_id"), F.lit("-interpretation-"), i.cast("string")
                        ).alias("id"),
                        F.lit("COMPLETED").alias("progressStatus"),
                        F.struct(F.array(s["v"]).alias("genomicInterpretations")).alias(
                            "diagnosis"
                        ),
                    ),
                ).alias("interpretations"),
            )
        )
        parts.append(collected)

    if diseases is not None:
        d = F.struct(
            F.col("_seq").alias("k"),
            F.struct(
                F.struct(
                    F.col("disease_term").alias("id"), F.col("disease_label").alias("label")
                ).alias("term")
            ).alias("v"),
        )
        parts.append(_collect_sorted(diseases, "patient_ID", d, "diseases"))

    if measurements is not None:
        m = F.struct(
            F.col("_seq").alias("k"),
            F.struct(
                F.struct(F.col("measurement_type").alias("id")).alias("type")
            ).alias("v"),
        )
        parts.append(_collect_sorted(measurements, "patient_ID", m, "measurements"))

    if biosamples is not None:
        b = F.struct(
            F.col("_seq").alias("k"),
            F.struct(
                F.col("biosample_id").alias("id"),
                F.struct(F.col("biosample_type").alias("id")).alias("type"),
            ).alias("v"),
        )
        parts.append(_collect_sorted(biosamples, "patient_ID", b, "biosamples"))

    if not parts:
        return spark.createDataFrame([], "id string")

    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, "patient_id", "full_outer")

    return out.select(
        F.col("patient_id").alias("id"),
        F.struct(F.col("patient_id").alias("id")).alias("subject"),
        *[c for c in out.columns if c != "patient_id"],
    )


def write_packets_json(packets: DataFrame, out_dir: str) -> None:
    """Scale path: one JSON document per packet row via the distributed
    writer (reference: per-patient numbered files on the driver,
    src/P6/__main__.py:200-212 — see write_packet_files for that shape)."""
    packets.write.mode("overwrite").json(out_dir)


def write_packet_files(packets: DataFrame, out_dir: str) -> int:
    """Driver-side per-patient numbered files mirroring the reference CLI
    (phenopacket_0.json, ...). Fine for workbook-sized data; use
    write_packets_json at scale."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for row in packets.toJSON().toLocalIterator():
        doc = json.loads(row)
        with open(os.path.join(out_dir, f"phenopacket_{n}.json"), "w") as f:
            json.dump(doc, f, indent=2)
        n += 1
    return n

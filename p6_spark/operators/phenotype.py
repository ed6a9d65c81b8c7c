"""Phenotype pipeline: workbook phenotype sheet -> validated Phenotype
records + audit rows, with ontology validation as broadcast joins.

Mirrors the reference row parser (src/P6/mapper.py:313-399) and the
Phenotype dataclass constraints (src/P6/phenotype.py:33-54):

  plan-time column check -> NAD filter (P4, warn) -> HPO cell regex
  parse (F5, unparseable -> error) -> CURIE zero-pad (F6) -> time
  normalize (F1) -> bool coercion (F2) -> constraint predicate (P8) ->
  ontology broadcast joins (J2: existence/obsolescence/label-match
  warnings) -> batch validators (A5: phenotypic-abnormality lineage,
  annotation propagation) as joins over the ancestors array.

Per-row ontology WARNINGS are produced from join results (row-correlated
audit rows), never from UDF side effects — Spark accumulators are not
exactly-once (SURVEY §7 fidelity trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6_spark.audit import StageResult, audit_entries, audit_from_rows, union_audits
from p6_spark.functions.hpo import hpo_curie, hpo_label, is_nad
from p6_spark.functions.scalars import normalize_time_like, to_bool
from p6_spark.loader import promote_patient_id
from p6_spark.schemas import (
    HPO_ID_PATTERN,
    PHENOTYPE_KEY_COLUMNS,
    TIMESTAMP_PATTERN,
    VALID_ID_PATTERN,
)
from p6_spark.sources.ontology import PHENOTYPIC_ABNORMALITY_ROOT


def map_phenotype_table(
    spark: SparkSession,
    df: DataFrame,
    sheet_name: str = "phenotype",
    ontology: DataFrame | None = None,
) -> StageResult:
    step = "map_phenotype"
    missing = sorted(PHENOTYPE_KEY_COLUMNS - set(df.columns))
    if missing:
        from p6_spark.schemas import PHENOTYPE_SCHEMA

        audit = audit_entries(
            spark, [(step, sheet_name, "error", f"missing required columns: {missing}")]
        )
        return StageResult(valid=spark.createDataFrame([], PHENOTYPE_SCHEMA), audit=audit)

    df = promote_patient_id(df, "phenotype")
    df = df.withColumn("_seq", F.monotonically_increasing_id())

    # P4: NAD placeholder -> skip row with warning (src/P6/mapper.py:330-334)
    nad = is_nad(F.col("hpo_id"))
    nad_audit = audit_from_rows(
        df,
        nad,
        step,
        sheet_name,
        "warning",
        # en dash, byte-exact with src/P6/mapper.py:331-333
        F.lit(f"Sheet '{sheet_name}': 'NAD' encountered – skipping phenotype row"),
    )
    df = df.filter(~nad)

    # F5/F6: parse label + digits, zero-pad CURIE
    df = (
        df.withColumn("_label", hpo_label(F.col("hpo_id")))
        .withColumn("_curie", hpo_curie(F.col("hpo_id")))
        .withColumn("_date", normalize_time_like(F.col("date_of_observation")))
        .withColumn("_status", to_bool(F.col("status")))
    )
    unparseable = F.col("_curie").isNull()
    parse_audit = audit_from_rows(
        df,
        unparseable,
        step,
        sheet_name,
        "error",
        # str(NaN) == 'nan' is what the reference formats for missing cells
        F.concat(
            F.lit(f"Sheet '{sheet_name}': Cannot parse HPO term+ID from '"),
            F.coalesce(F.trim(F.col("hpo_id").cast("string")), F.lit("nan")),
            F.lit("'"),
        ),
    )
    df = df.filter(~unparseable)

    # P8: dataclass constraints (src/P6/phenotype.py:33-54)
    # Phenotype.__post_init__ messages with the offending value, in check
    # order (src/P6/phenotype.py:33-54)
    pid_str = F.coalesce(F.col("phenotype_patient_ID").cast("string"), F.lit("nan"))
    fail = (
        F.when(
            # str(NaN) == 'nan' matches _VALID_ID in the reference
            # (src/P6/mapper.py:367), so a missing ID is bug-compatibly
            # valid and keys a 'nan' record.
            ~pid_str.rlike(VALID_ID_PATTERN),
            F.concat(F.lit("Invalid patient ID: '"), pid_str, F.lit("'")),
        )
        .when(
            ~F.col("_curie").rlike(HPO_ID_PATTERN),
            F.concat(F.lit("Invalid HPO ID: '"), F.col("_curie"), F.lit("'")),
        )
        .when(
            ~F.col("_date").rlike(TIMESTAMP_PATTERN),
            F.concat(
                F.lit("Invalid date_of_observation: '"), F.col("_date"), F.lit("'")
            ),
        )
    )
    df = df.withColumn("_fail", fail)
    constraint_audit = audit_from_rows(
        df,
        F.col("_fail").isNotNull(),
        step,
        sheet_name,
        "error",
        F.concat(F.lit(f"Sheet '{sheet_name}': "), F.col("_fail")),
    )
    ok = df.filter(F.col("_fail").isNull())

    records = ok.select(
        "_seq",
        F.coalesce(F.col("phenotype_patient_ID").cast("string"), F.lit("nan")).alias(
            "phenotype_patient_ID"
        ),
        F.col("_curie").alias("hpo_id"),
        F.col("_label").alias("raw_label"),
        F.col("_date").alias("date_of_observation"),
        F.col("_status").alias("status"),
    )

    audits = [nad_audit, parse_audit, constraint_audit]

    if ontology is not None:
        audits.append(_ontology_audit(records, ontology, step, sheet_name))
        audits.append(_propagation_audit(records, ontology, step, sheet_name))

    return StageResult(
        valid=records.drop("raw_label"), audit=union_audits(*audits)
    )


def _ontology_audit(
    records: DataFrame, ontology: DataFrame, step: str, sheet_name: str
) -> DataFrame:
    """J2 + A5 per-term checks as ONE broadcast left join: existence,
    obsolescence (with replacement suggestions), label match, and
    phenotypic-abnormality lineage (src/P6/mapper.py:380-397,426-440)."""
    terms = F.broadcast(ontology)
    j = records.join(terms, records.hpo_id == terms.term_id, "left")
    msg_prefix = F.lit(f"Sheet '{sheet_name}': ")
    checks = [
        (
            F.col("term_id").isNull(),
            F.concat(msg_prefix, F.lit("HPO ID '"), F.col("hpo_id"), F.lit("' not found in ontology")),
        ),
        (
            F.col("term_id").isNotNull() & F.col("is_obsolete"),
            F.concat(
                msg_prefix,
                F.lit("'"),
                F.col("hpo_id"),
                F.lit("' is obsolete; use "),
                F.coalesce(F.array_join(F.col("alt_term_ids"), ", "), F.lit("")),
            ),
        ),
        (
            F.col("term_id").isNotNull()
            & (F.col("raw_label") != "")
            & (F.lower(F.col("raw_label")) != F.lower(F.coalesce(F.col("name"), F.lit("")))),
            F.concat(
                msg_prefix,
                F.lit("label '"),
                F.col("raw_label"),
                F.lit("' does not match ontology name '"),
                F.coalesce(F.col("name"), F.lit("")),
                F.lit("'"),
            ),
        ),
        (
            F.col("term_id").isNotNull()
            & ~F.col("is_obsolete")
            & ~F.array_contains(
                F.coalesce(F.col("ancestors"), F.array()), PHENOTYPIC_ABNORMALITY_ROOT
            ),
            F.concat(
                msg_prefix,
                F.lit("'"),
                F.col("hpo_id"),
                F.lit("' is not a descendant of phenotypic abnormality"),
            ),
        ),
    ]
    parts = [
        j.filter(cond).select(
            F.lit(step).alias("step"),
            F.lit(sheet_name).alias("sheet"),
            F.lit("warning").alias("level"),
            msg.cast("string").alias("message"),
        )
        for cond, msg in checks
    ]
    return union_audits(*parts)


def _propagation_audit(
    records: DataFrame, ontology: DataFrame, step: str, sheet_name: str
) -> DataFrame:
    """A5 annotation-propagation check: two terms in the same sheet where
    one is an ancestor of the other -> redundancy warning. Join of the
    sheet's distinct terms against the exploded ancestor closure — no
    pairwise O(n^2) over rows, only over the sheet's distinct term set."""
    sheet_terms = records.select("hpo_id").distinct()
    anc = (
        F.broadcast(ontology)
        .join(sheet_terms, F.col("term_id") == sheet_terms.hpo_id, "left_semi")
        .select(F.col("term_id"), F.explode(F.coalesce(F.col("ancestors"), F.array())).alias("anc"))
    )
    redundant = anc.join(
        sheet_terms.select(F.col("hpo_id").alias("present_anc")),
        anc.anc == F.col("present_anc"),
        "inner",
    )
    return redundant.select(
        F.lit(step).alias("step"),
        F.lit(sheet_name).alias("sheet"),
        F.lit("warning").alias("level"),
        F.concat(
            F.lit(f"Sheet '{sheet_name}': term '"),
            F.col("term_id"),
            F.lit("' is redundant with its ancestor '"),
            F.col("present_anc"),
            F.lit("' in the same sheet"),
        ).alias("message"),
    )

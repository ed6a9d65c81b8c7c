"""Genotype pipeline: workbook genotype sheet -> validated, exploded
Genotype records + audit rows.

Mirrors the reference row parser (src/P6/mapper.py:237-311) and the
Genotype dataclass constraints (src/P6/genotype.py:140-175) as one
declarative DataFrame flow:

  plan-time column check -> HGVS/raw consistency audit (J3) ->
  row-level validity predicate (P8) -> dead-letter split ->
  zip-truncation explode (G1) -> vocab mapping (F9/F10)

Reference semantics preserved exactly:
- ANY invalid zipped token pair, missing chromosome, or constraint
  violation drops the WHOLE row (all its exploded records), matching the
  parser's `return [], []` bail-outs.
- Tokens beyond the zip truncation are never validated (reference zips
  first, validates inside the loop).
- Missing email is defaulted BEFORE the email-format constraint.

Everything is Column logic; at 100 TB this is a single codegen'd scan
with two outputs (records, audit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from p6_spark.audit import StageResult, audit_entries, audit_from_rows, union_audits
from p6_spark.functions.hgvs import hgvs_g_is_malformed, hgvs_raw_consistent
from p6_spark.functions.scalars import email_or_default, to_bool
from p6_spark.loader import promote_patient_id
from p6_spark.schemas import (
    ALLOWED_CHROM_ENCODINGS,
    EMAIL_PATTERN,
    GENOTYPE_KEY_COLUMNS,
    INHERITANCE_MAP,
    VALID_ID_PATTERN,
    ZYGOSITY_MAP,
)


def _long_like(col: Column) -> Column:
    """int()-compatible coercion: integer strings directly; float-shaped
    strings only when integral (int(16177614.0) == 16177614)."""
    s = F.trim(col.cast("string"))
    direct = s.try_cast("long")
    via_double = s.try_cast("double")
    return F.coalesce(
        direct,
        F.when(via_double == F.floor(via_double), F.floor(via_double).cast("long")),
    )


def map_genotype_table(
    spark: SparkSession,
    df: DataFrame,
    sheet_name: str = "genotype",
    strict_variants: bool = False,
) -> StageResult:
    step = "map_genotype"
    missing = sorted(GENOTYPE_KEY_COLUMNS - set(df.columns))
    if missing:
        # table-level rejection (reference src/P6/mapper.py:558-563)
        audit = audit_entries(
            spark,
            [(step, sheet_name, "error", f"missing required columns: {missing}")],
        )
        return StageResult(valid=spark.createDataFrame([], _empty_schema()), audit=audit)

    df = promote_patient_id(df, "genotype")
    df = df.withColumn("_seq", F.monotonically_increasing_id())

    # --- normalize (F3 email default, F4 chromosome canonicalization) ------
    # Reference parity for missing cells: parse_genotype_row stringifies
    # every value (src/P6/mapper.py:248-283), so a NaN chromosome becomes
    # 'nan' -> 'chrnan' (NOT 'Missing chromosome' — that fires only for
    # empty strings), and NaN zygosity/inheritance become the token 'nan'
    # -> 'Unrecognized ... code' error. Spark nulls model pandas NaN.
    chrom_raw = F.trim(F.coalesce(F.col("chromosome").cast("string"), F.lit("nan")))
    df = df.withColumn("contact_email", email_or_default(F.col("contact_email")))
    df = df.withColumn("_chrom_missing", chrom_raw == "")
    df = df.withColumn(
        "_chrom",
        F.when(F.lower(chrom_raw).startswith("chr"), chrom_raw).otherwise(
            F.concat(F.lit("chr"), chrom_raw)
        ),
    )

    # --- zip-truncation token pairs (G1) -----------------------------------
    z_tokens = F.transform(
        F.split(F.coalesce(F.col("zygosity").cast("string"), F.lit("nan")), "/"),
        lambda t: F.lower(F.trim(t)),
    )
    i_tokens = F.transform(
        F.split(F.coalesce(F.col("inheritance").cast("string"), F.lit("nan")), "/"),
        lambda t: F.lower(F.trim(t)),
    )
    pairs = F.filter(
        F.arrays_zip(z_tokens.alias("z"), i_tokens.alias("i")),
        lambda p: p["z"].isNotNull() & p["i"].isNotNull(),
    )
    df = df.withColumn("_pairs", pairs)
    bad_z = F.exists(F.col("_pairs"), lambda p: ~p["z"].isin(list(ZYGOSITY_MAP)))
    bad_i = F.exists(F.col("_pairs"), lambda p: ~p["i"].isin(list(INHERITANCE_MAP)))

    # --- J3: HGVS vs raw coordinates (warn, or error under --strict) -------
    # check_hgvs_consistency (src/P6/mapper.py:561-575) first ERRORS on any
    # g. string its [^:]+ pattern cannot parse (every del/dup/ins, and
    # 'nan' from a missing cell) and returns early; only parseable strings
    # reach the mismatch comparison. Neither audit drops the row.
    malformed = hgvs_g_is_malformed(F.col("hgvsg"))
    malformed_audit = audit_from_rows(
        df,
        malformed,
        step,
        sheet_name,
        "error",
        F.concat(
            F.lit(f"Sheet '{sheet_name}': malformed HGVS g. notation '"),
            F.coalesce(F.trim(F.col("hgvsg").cast("string")), F.lit("nan")),
            F.lit("'"),
        ),
    )
    consistent = hgvs_raw_consistent(
        F.col("hgvsg"),
        F.col("chromosome"),
        F.col("start_position"),
        F.col("end_position"),
        F.col("reference"),
        F.col("alternate"),
    )
    hgvs_audit = audit_from_rows(
        df,
        ~consistent,
        step,
        sheet_name,
        "error" if strict_variants else "warning",
        F.concat(
            F.lit(f"Sheet '{sheet_name}': hgvsg "),
            F.coalesce(F.col("hgvsg").cast("string"), F.lit("<null>")),
            F.lit(" does not match raw variant columns"),
        ),
    )

    # --- row-level validity (P6op/P7/P8), first failing rule wins ----------
    st = _long_like(F.col("start_position"))
    en = _long_like(F.col("end_position"))
    nonempty = lambda c: F.trim(F.col(c).cast("string")) != ""  # noqa: E731
    chrom_ok = F.lower(F.col("_chrom")).startswith("chr") | F.lower(F.col("_chrom")).isin(
        list(ALLOWED_CHROM_ENCODINGS)
    )
    fail_reason = (
        F.when(bad_z, F.lit("Unrecognized zygosity code"))
        .when(bad_i, F.lit("Unrecognized inheritance code"))
        .when(F.col("_chrom_missing"), F.lit("Missing chromosome"))
        .when(
            # str(NaN) == 'nan' matches _VALID_ID in the reference, so a
            # missing ID yields a 'nan'-keyed record — bug-compatible.
            ~F.coalesce(
                F.col("genotype_patient_ID").cast("string"), F.lit("nan")
            ).rlike(VALID_ID_PATTERN),
            F.lit("Invalid patient ID"),
        )
        .when(~F.col("contact_email").rlike(EMAIL_PATTERN), F.lit("Invalid contact email"))
        .when(~chrom_ok, F.lit("Unrecognized chromosome"))
        .when(
            st.isNull() | (st < 0), F.lit("start_position must be a non-negative integer")
        )
        .when(en.isNull() | (en < 0), F.lit("end_position must be a non-negative integer"))
        .when(
            ~(
                nonempty("reference")
                & nonempty("alternate")
                & nonempty("gene_symbol")
                & nonempty("hgvsg")
                & nonempty("hgvsc")
                & nonempty("hgvsp")
            ),
            F.lit("variant string fields must be nonempty"),
        )
    )
    df = df.withColumn("_fail", fail_reason)
    row_audit = audit_from_rows(
        df,
        F.col("_fail").isNotNull(),
        step,
        sheet_name,
        "error",
        F.concat(F.lit(f"Sheet '{sheet_name}': "), F.col("_fail")),
    )
    ok = df.filter(F.col("_fail").isNull())

    # --- explode + vocab map (F9/F10) --------------------------------------
    z_map = F.create_map(*[F.lit(x) for kv in ZYGOSITY_MAP.items() for x in kv])
    i_map = F.create_map(*[F.lit(x) for kv in INHERITANCE_MAP.items() for x in kv])
    records = (
        ok.select(
            "_seq",
            F.coalesce(F.col("genotype_patient_ID").cast("string"), F.lit("nan")).alias(
                "genotype_patient_ID"
            ),
            "contact_email",
            to_bool(F.col("phasing")).alias("phasing"),
            F.col("_chrom").alias("chromosome"),
            st.alias("start_position"),
            en.alias("end_position"),
            F.col("reference").cast("string").alias("reference"),
            F.col("alternate").cast("string").alias("alternate"),
            F.col("gene_symbol").cast("string").alias("gene_symbol"),
            F.col("hgvsg").cast("string").alias("hgvsg"),
            F.col("hgvsc").cast("string").alias("hgvsc"),
            F.col("hgvsp").cast("string").alias("hgvsp"),
            F.posexplode(F.col("_pairs")).alias("_pos", "_pair"),
        )
        .withColumn("zygosity", z_map[F.col("_pair.z")])
        .withColumn("inheritance", i_map[F.col("_pair.i")])
        .drop("_pair")
    )
    return StageResult(
        valid=records, audit=union_audits(malformed_audit, hgvs_audit, row_audit)
    )


def _empty_schema():
    from p6_spark.schemas import GENOTYPE_SCHEMA

    return GENOTYPE_SCHEMA

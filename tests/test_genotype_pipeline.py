"""Genotype pipeline tests — mirror reference
tests/test_mapper_parse_genotype_row.py and
tests/test_mapper_check_hgvs.py semantics."""

from __future__ import annotations

from p6_spark.operators.genotype import map_genotype_table

COLS = (
    "Searchable Patient ID,contact_email,phasing,chrom,start,end,ref,alt,gene,"
    "hgvsg,hgvsc,hgvsp,zygosity,inheritance"
).split(",")


def geno_df(spark, rows):
    from p6_spark.loader import normalize_columns

    df = spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in COLS))
    return normalize_columns(df)


BASE = dict(
    pid="P100",
    email="u@example.com",
    phasing="1",
    chrom="16",
    start="100",
    end="100",
    ref="A",
    alt="G",
    gene="ABCC6",
    hgvsg="16:g.100A>G",
    hgvsc="NM_000000.0:c.100A>G",
    hgvsp="NP_000000.0:p.Lys67Asn",
    zyg="het",
    inh="inherited",
)


def row(**kw):
    d = {**BASE, **kw}
    return (
        d["pid"], d["email"], d["phasing"], d["chrom"], d["start"], d["end"],
        d["ref"], d["alt"], d["gene"], d["hgvsg"], d["hgvsc"], d["hgvsp"],
        d["zyg"], d["inh"],
    )


def test_multi_token_explosion(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(zyg="het/hom", inh="inherited/denovo")]))
    recs = r.valid.orderBy("_pos").collect()
    assert len(recs) == 2
    assert recs[0]["zygosity"] == "heterozygous"
    assert recs[0]["inheritance"] == "inherited"
    assert recs[1]["zygosity"] == "homozygous"
    assert recs[1]["inheritance"] == "de_novo_mutation"


def test_zip_truncation_five_by_three(spark):
    # 5 zygosity x 3 inheritance -> 3 records (reference zip truncation,
    # tests/data phenocopy workbook case)
    r = map_genotype_table(
        spark,
        geno_df(
            spark,
            [row(zyg="het/hom/comphet/hemi/mosaic", inh="unknown/inherited/denovo")],
        ),
    )
    recs = r.valid.orderBy("_pos").collect()
    assert [x["zygosity"] for x in recs] == [
        "heterozygous",
        "homozygous",
        "compound_heterozygosity",
    ]


def test_unknown_zygosity_drops_whole_row(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(zyg="het/badcode", inh="inherited/denovo")]))
    assert r.valid.count() == 0
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert any("zygosity" in m for m in msgs)


def test_missing_chromosome_rejected(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(chrom="")]))
    assert r.valid.count() == 0
    assert any("Missing chromosome" in a["message"] for a in r.audit.collect())


def test_null_email_defaulted(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(email=None)]))
    recs = r.valid.collect()
    assert len(recs) == 1
    assert recs[0]["contact_email"] == "unknown@example.com"


def test_chromosome_prefixed(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(chrom="16")]))
    assert r.valid.collect()[0]["chromosome"] == "chr16"


def test_invalid_patient_id_rejected(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(pid="P-100")]))
    assert r.valid.count() == 0
    assert any("Invalid patient ID" in a["message"] for a in r.audit.collect())


def test_hgvs_mismatch_warns_but_keeps_row(spark):
    r = map_genotype_table(spark, geno_df(spark, [row(start="107", end="108")]))
    assert r.valid.count() == 1
    warns = [a for a in r.audit.collect() if a["level"] == "warning"]
    assert any("disagrees with raw (" in a["message"] for a in warns)


def test_hgvs_mismatch_strict_is_error(spark):
    r = map_genotype_table(
        spark, geno_df(spark, [row(start="107", end="108")]), strict_variants=True
    )
    errs = [a for a in r.audit.collect() if a["level"] == "error"]
    assert any("disagrees with raw (" in a["message"] for a in errs)


def test_bed_like_coordinates_pass(spark):
    # start = pos-1, end = pos (reference BED-like OR branch,
    # src/P6/mapper.py:480-489)
    r = map_genotype_table(spark, geno_df(spark, [row(start="99", end="100")]))
    assert r.valid.count() == 1
    assert not [a for a in r.audit.collect() if a["level"] == "warning"]


def test_missing_required_columns_rejects_table(spark):
    df = spark.createDataFrame([("P1", "u@example.com")], "`Patient ID` string, contact_email string")
    r = map_genotype_table(spark, df)
    assert r.valid.count() == 0
    assert any("missing required columns" in a["message"] for a in r.audit.collect())


def test_phased_unphased_truthiness(spark):
    # 'Phased' AND 'Unphased' are both True via the fallback (bug-compatible)
    r = map_genotype_table(
        spark, geno_df(spark, [row(phasing="Phased"), row(pid="P200", phasing="Unphased")])
    )
    assert [x["phasing"] for x in r.valid.collect()] == [True, True]


def test_error_messages_match_reference_format(spark):
    # token-bearing messages, byte-exact with the reference's
    # f"... {tok!r}" formatting (src/P6/mapper.py:262-268, genotype.py:142-170)
    r = map_genotype_table(spark, geno_df(spark, [row(zyg="het/badcode", inh="inherited/denovo")]))
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert "Sheet 'genotype': Unrecognized zygosity code 'badcode'" in msgs

    r = map_genotype_table(spark, geno_df(spark, [row(pid="P-100")]))
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert "Sheet 'genotype': Invalid patient ID: 'P-100'" in msgs

    r = map_genotype_table(spark, geno_df(spark, [row(start=None)]))
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert "Sheet 'genotype': cannot convert float NaN to integer" in msgs

    r = map_genotype_table(spark, geno_df(spark, [row(start="abc")]))
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert "Sheet 'genotype': invalid literal for int() with base 10: 'abc'" in msgs


def test_row_check_order_matches_reference_pair_loop(spark):
    # pair 0 codes valid, chromosome missing, pair 1 zygosity bad: the
    # reference validates pair 0 (codes ok), then bails on the missing
    # chromosome BEFORE ever reaching pair 1's bad code.
    r = map_genotype_table(
        spark, geno_df(spark, [row(chrom="", zyg="het/badcode", inh="inherited/denovo")])
    )
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert msgs == ["Sheet 'genotype': Missing chromosome"]

    # pair 0 inheritance bad beats pair 1 zygosity bad AND the missing
    # chromosome (per-pair checks run first for pair 0)
    r = map_genotype_table(
        spark, geno_df(spark, [row(chrom="", zyg="het/badcode", inh="badinh/denovo")])
    )
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert msgs == ["Sheet 'genotype': Unrecognized inheritance code 'badinh'"]


def test_null_zygosity_audits_as_nan_token(spark):
    # missing zygosity cell: the reference stringifies NaN and errors with
    # the 'nan' token instead of silently dropping the row
    r = map_genotype_table(spark, geno_df(spark, [row(zyg=None)]))
    assert r.valid.count() == 0
    msgs = [a["message"] for a in r.audit.collect() if a["level"] == "error"]
    assert "Sheet 'genotype': Unrecognized zygosity code 'nan'" in msgs

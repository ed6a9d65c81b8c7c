"""Golden parity against the reference's REAL Excel workbooks
(/root/reference/tests/data/*.xlsx), read through the dependency-free
stdlib xlsx parser (p6_spark/sources/xlsx.py).

Mirrors reference tests/test_cli_parse_excel.py:38-70 (nonzero genotype
and phenotype counts per workbook) and the golden values of
tests/test_mapper_apply_construct.py:17-77 (HP zero-padding, chr-stripped
g. expression in the packet, clean happy path).
"""

from __future__ import annotations

import os

import pytest

from p6_spark.loader import load_workbook
from p6_spark.mapper import apply_mapping
from p6_spark.sources.xlsx import read_xlsx

DATA = "/root/reference/tests/data"
SYDNEY = os.path.join(DATA, "Sydney_Python_transformation.xlsx")
PHENOCOPY = os.path.join(DATA, "Python_headers_phenocopy_transformation.xlsx")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SYDNEY), reason="reference workbooks not available"
)


def test_read_xlsx_shapes():
    sheets = read_xlsx(SYDNEY)
    assert list(sheets) == ["genotype", "phenotype", "severity periodicity"]
    geno = sheets["genotype"]
    assert geno[0][:4] == ["Searchable Patient ID", "Contact Email", "Phasing", "chrom"]
    assert len(geno) == 13  # header + 12 data rows
    # sparse cell: row 1 has no contact email -> None, not a shift
    assert geno[1][0] == "1" and geno[1][1] is None and geno[1][3] == "chr16"
    # the 'severity periodicity' sheet is headed but has no data rows
    assert sheets["severity periodicity"] == [["to be designed"]]


def test_headed_zero_row_sheet_loads_without_crash(spark):
    # ADVICE: empty template sheets must not break createDataFrame
    tables = load_workbook(spark, SYDNEY)
    sp = tables["severity periodicity"]
    assert sp.count() == 0
    assert sp.columns == ["to_be_designed"]
    assert all(f.dataType.simpleString() == "string" for f in sp.schema.fields)


def test_sydney_workbook_golden(spark):
    tables = load_workbook(spark, SYDNEY)
    res = apply_mapping(spark, tables)
    stats = res.stats()
    # reference CLI test asserts >0 of each; exact counts pinned as goldens
    assert stats["n_genotype"] == 12
    assert stats["n_phenotype"] == 14  # 15 rows, one NAD dropped
    assert stats["n_patients"] == 13
    # only the NAD warning — the happy path is audit-clean like the
    # reference's `assert not note.has_errors(...)`
    audit = [(r["level"], r["message"]) for r in res.audit.collect()]
    assert [lvl for lvl, _ in audit] == ["warning"]
    assert "'NAD' encountered" in audit[0][1]

    # 'Rod-cone dystrophy HP:0000510 ' parses + zero-pads (HP:0000510
    # golden from reference test_mapper_apply_construct.py:66)
    pheno = {
        (r["phenotype_patient_ID"], r["hpo_id"])
        for r in res.records["phenotype"].collect()
    }
    assert ("1", "HP:0000510") in pheno

    # packet expression value is the chr-stripped normalized g. string
    # (reference golden '16:g.100A>G' shape, :68-75)
    pkt = res.packets.filter("id = '1'").collect()[0]
    expr = pkt["interpretations"][0]["diagnosis"]["genomicInterpretations"][0][
        "variantInterpretation"
    ]["variationDescriptor"]["expressions"][0]
    # value-only: the reference's enum lookup never sets syntax, and
    # MessageToJson omits default fields (src/P6/genotype.py:374-376)
    assert expr.asDict() == {"value": "16:g.16177614C>T"}
    assert pkt["subject"]["id"] == "1"


def test_sydney_packet_byte_golden(spark, tmp_path):
    """Whole-packet byte-level golden for Sydney patient '1'
    (tests/fixtures/sydney_packet_1.golden.json), generated once and
    reviewed field-by-field against the reference's construction:

    - camelCase protobuf-JSON field names, proto-omitted defaults
      (MessageToJson shape; reference src/P6/__main__.py:200-212)
    - expression is value-only '16:g.16177614C>T': Expression.syntax is a
      STRING proto field, so the reference's enum lookup
      (getattr(type(expr), 'HGVS', None)) returns None and syntax is never
      set (src/P6/genotype.py:357-375); chr prefix stripped by
      _normalize_g_expression (genotype.py:260-270)
    - allelicState {GENO:0000135, heterozygous}: normalized zygosity term +
      GENO code table (genotype.py:57-62,287-289)
    - geneContext.symbol from the gene_symbol column (genotype.py:293-296)
    - interpretation id '{patient}-interpretation-{i}', COMPLETED /
      CONTRIBUTORY statuses (mapper.py:845-858)
    - phenotypicFeatures carry only type.id (no label; excluded only when
      status is falsy) (mapper.py:828-841)
    - no metaData block: the reference mapper never populates one
    """
    tables = load_workbook(spark, SYDNEY)
    res = apply_mapping(spark, tables)
    import json

    got = json.loads(
        res.packets.filter("id = '1'").toJSON().collect()[0]
    )
    golden_path = os.path.join(os.path.dirname(__file__), "fixtures", "sydney_packet_1.golden.json")
    with open(golden_path) as f:
        golden_text = f.read()
    # byte-level: the emitted document re-serialized with the fixture's
    # formatting must reproduce the fixture exactly
    assert json.dumps(got, indent=2) + "\n" == golden_text
    # and through the real per-patient file sink (reference CLI shape)
    from p6_spark.operators.packet import write_packet_files

    n = write_packet_files(res.packets.filter("id = '1'"), str(tmp_path / "pkts"))
    assert n == 1
    with open(tmp_path / "pkts" / "phenopacket_0.json") as f:
        assert json.load(f) == json.loads(golden_text)


def test_phenocopy_workbook_golden(spark):
    tables = load_workbook(spark, PHENOCOPY)
    res = apply_mapping(spark, tables)
    stats = res.stats()
    # row 1: zygosity 'het/hom/comphet/hemi/mosaic' zips against
    # inheritance 'unknown/inherited/denovo' -> truncation to 3 records
    # (G1); row 2 bails with an unrecognized-code error.
    assert stats["n_genotype"] == 3
    assert stats["n_phenotype"] == 4
    assert stats["n_patients"] == 3
    zygs = [
        r["zygosity"]
        for r in res.records["genotype"].orderBy("_pos").collect()
    ]
    assert zygs == ["heterozygous", "homozygous", "compound_heterozygosity"]
    errors = [
        r["message"] for r in res.audit.filter("level = 'error'").collect()
    ]
    assert any("zygosity" in m or "inheritance" in m for m in errors)


def test_phenocopy_packet_byte_golden(spark, tmp_path):
    """Byte-level goldens for the phenocopy workbook — the harder
    serialization cases the Sydney packet doesn't cover (VERDICT r3
    item 5):

    - XXXXYYYY1: the multi-record zip-truncation patient. zygosity
      'het/hom/comphet/hemi/mosaic' zips against inheritance
      'unknown/inherited/denovo' and TRUNCATES to 3 records (reference
      src/P6/mapper.py:247-260), so the packet carries THREE
      interpretations '{patient}-interpretation-{0,1,2}' over the same
      chr-stripped expression '16:g.16177614C>T', with per-record
      allelicState {GENO:0000135 heterozygous, GENO:0000134 homozygous,
      GENO:0000191 compound_heterozygosity} (genotype.py:58-64).
    - se3453r: 'hp 0100753' and bare-digit HPO forms zero-pad to
      HP:0100753 / HP:0001250 (test_mapper_parse_phenotype_row.py
      forms), and — the quirk worth pinning — status 'E' (excluded)
      falls through _to_bool's fallback `bool('E')` == True
      (mapper.py:219-236), so the reference NEVER sets
      feature.excluded for O/E statuses and the features serialize as
      bare type.id objects.
    """
    import json

    tables = load_workbook(spark, PHENOCOPY)
    res = apply_mapping(spark, tables)
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    for pid, fname in [
        ("XXXXYYYY1", "phenocopy_packet_xxxxyyyy1.golden.json"),
        ("se3453r", "phenocopy_packet_se3453r.golden.json"),
    ]:
        got = json.loads(
            res.packets.filter(f"id = '{pid}'").toJSON().collect()[0]
        )
        with open(os.path.join(fixtures, fname)) as f:
            golden_text = f.read()
        assert json.dumps(got, indent=2) + "\n" == golden_text, pid
    # and the explosion patient through the real per-patient file sink
    from p6_spark.operators.packet import write_packet_files

    n = write_packet_files(
        res.packets.filter("id = 'XXXXYYYY1'"), str(tmp_path / "pkts")
    )
    assert n == 1
    with open(tmp_path / "pkts" / "phenopacket_0.json") as f:
        on_disk = json.load(f)
    with open(
        os.path.join(fixtures, "phenocopy_packet_xxxxyyyy1.golden.json")
    ) as f:
        assert on_disk == json.load(f)
    assert len(on_disk["interpretations"]) == 3


def test_parse_excel_cli_on_real_xlsx(tmp_path, capsys, spark):
    from p6_spark.cli import main

    rc = main(["parse-excel", SYDNEY, "-o", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Created 13 phenopackets" in out
    assert "n_genotype: 12" in out
    assert "n_phenotype: 14" in out

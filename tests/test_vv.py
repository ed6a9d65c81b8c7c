"""VariantValidator enrichment (S9/J4 opt-in) — offline tests with a
mocked transport: retry/backoff schedule, v2->v1 fallback, payload
normalizers, executor-side deduped fetch, flag gating, and the packet
geneContext fold-in. Mirrors /root/reference/src/P6/vv_lookup.py
semantics without any network."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p6_spark.sources import vv

V2_PAYLOAD = {
    "hgnc": {"hgnc_id": "HGNC:36", "ensembl_gene_id": "ENSG00000197563"},
    "refseq": [{"accession": "NM_001171.6"}, {"accession": "NM_001351800.1"}],
    "ensembl": [{"accession": "ENST00000205557.12"}],
}
V1_PAYLOAD = {
    "hgnc_id": "HGNC:36",
    "ensembl": "ENSG00000197563",
    "refseq": ["NM_001171.6"],
}


def _no_sleep(_s: float) -> None:
    pass


# -- transports for the mapInPandas stage: built as CLOSURES so
# cloudpickle ships them by value (a tests/ module-level function is
# not importable inside executor Python workers) -----------------------


def make_ok_transport():
    def t(url: str) -> dict:
        marker = "gene2transcripts_v2/"
        g = url.split(marker, 1)[1].split("/", 1)[0] if marker in url else ""
        return {
            "hgnc": {"hgnc_id": f"HGNC:{len(g)}", "ensembl_gene_id": f"ENSG_{g}"},
            "refseq": [{"accession": f"NM_{g}.1"}],
            "ensembl": [],
        }

    return t


def make_down_transport():
    def t(url: str) -> dict:
        raise ConnectionError("vv unreachable")

    return t


mock_transport_ok = make_ok_transport()
mock_transport_down = make_down_transport()


# -- client: retry / fallback / normalizers ----------------------------


def test_retry_then_success():
    calls, slept = [], []

    def flaky(url):
        calls.append(url)
        if len(calls) < 3:
            raise ConnectionError("boom")
        return V2_PAYLOAD

    out = vv.get_gene_xrefs_vv("ABCC6", transport=flaky, sleep=slept.append)
    assert out["hgnc_id"] == "HGNC:36"
    assert out["refseq_transcripts"] == ["NM_001171.6", "NM_001351800.1"]
    assert len(calls) == 3
    # reference backoff schedule: 0.25 * 2^i per failed attempt
    assert slept == [0.25, 0.5]


def test_all_attempts_fail_raises():
    calls = []

    def dead(url):
        calls.append(url)
        raise ConnectionError("down")

    with pytest.raises(vv.VVLookupError, match="Failed GET"):
        vv.get_gene_xrefs_vv("ABCC6", transport=dead, sleep=_no_sleep)
    assert len(calls) == 4  # the reference's 4 attempts


def test_v2_preferred_single_call():
    calls = []

    def t(url):
        calls.append(url)
        return V2_PAYLOAD

    out = vv.get_gene_xrefs_vv("ABCC6", transport=t, sleep=_no_sleep)
    assert out["ensembl_transcripts"] == ["ENST00000205557.12"]
    assert len(calls) == 1
    assert "gene2transcripts_v2/ABCC6/mane/refseq/GRCh38" in calls[0]


def test_v1_fallback_when_v2_empty():
    calls = []

    def t(url):
        calls.append(url)
        return {} if "gene2transcripts_v2" in url else V1_PAYLOAD

    out = vv.get_gene_xrefs_vv("ABCC6", transport=t, sleep=_no_sleep)
    assert out["hgnc_id"] == "HGNC:36"
    assert out["ensembl_gene_id"] == "ENSG00000197563"
    assert out["refseq_transcripts"] == ["NM_001171.6"]
    assert len(calls) == 2
    assert "tools/gene2transcripts/ABCC6" in calls[1]


def test_both_empty_raises():
    with pytest.raises(vv.VVLookupError, match="No xrefs found"):
        vv.get_gene_xrefs_vv("NOPE", transport=lambda u: {}, sleep=_no_sleep)


def test_empty_query_raises():
    with pytest.raises(vv.VVLookupError):
        vv.get_gene_xrefs_vv("", transport=lambda u: V2_PAYLOAD, sleep=_no_sleep)


def test_normalizers_tolerate_junk_shapes():
    assert vv._normalize_v2(["not", "a", "dict"])["hgnc_id"] == ""
    assert vv._normalize_v1(None)["refseq_transcripts"] == []
    # v2 accession collector skips malformed entries
    got = vv._normalize_v2({"refseq": [{"accession": "NM_1"}, {"x": 1}, "s"]})
    assert got["refseq_transcripts"] == ["NM_1"]


# -- Spark stage: deduped executor-side fetch + flag gating ------------


def test_gene_xrefs_table_dedupes_and_fetches(spark):
    genes = spark.createDataFrame(
        [("BRCA1",), ("BRCA1",), ("TP53",), (None,), ("",)],
        "gene_symbol string",
    )
    rows = {
        r["gene_symbol"]: r
        for r in vv.gene_xrefs_table(genes, transport=mock_transport_ok).collect()
    }
    assert set(rows) == {"BRCA1", "TP53"}  # deduped, null/empty dropped
    assert rows["BRCA1"]["hgnc_id"] == "HGNC:5"
    assert rows["TP53"]["ensembl_gene_id"] == "ENSG_TP53"
    assert rows["TP53"]["refseq_transcripts"] == ["NM_TP53.1"]
    assert all(r["vv_ok"] for r in rows.values())


def test_gene_xrefs_table_degrades_on_failure(spark):
    genes = spark.createDataFrame([("BRCA1",)], "gene_symbol string")
    # client retries run inside the executor; failure must yield an
    # empty-xref row, never a job failure (enrichment is best-effort)
    [r] = vv.gene_xrefs_table(genes, transport=mock_transport_down).collect()
    assert r["vv_ok"] is False
    assert r["hgnc_id"] == "" and r["refseq_transcripts"] == []


def test_enrich_flag_off_is_identity(spark):
    g = spark.createDataFrame([("p1", "BRCA1")], "pid string, gene_symbol string")
    assert vv.enrich_genotypes_with_xrefs(g, enabled=False) is g
    # and the env default is off
    assert vv.xrefs_enabled() is False


def test_enrich_flag_on_adds_columns(spark):
    g = spark.createDataFrame(
        [("p1", "BRCA1"), ("p2", "TP53"), ("p3", "BRCA1")],
        "pid string, gene_symbol string",
    )
    out = vv.enrich_genotypes_with_xrefs(
        g, enabled=True, transport=mock_transport_ok
    )
    got = {(r["pid"]): (r["hgnc_id"], r["ensembl_gene_id"]) for r in out.collect()}
    assert got == {
        "p1": ("HGNC:5", "ENSG_BRCA1"),
        "p2": ("HGNC:4", "ENSG_TP53"),
        "p3": ("HGNC:5", "ENSG_BRCA1"),
    }
    assert out.count() == 3  # left join: no row loss


def test_packet_genecontext_folds_xrefs_in(spark, monkeypatch):
    """Flag-on end-to-end: apply_mapping with P6_SPARK_ENRICH_GENE_XREFS=1
    and the offline transport hook surfaces valueId/alternateIds in
    geneContext; the symbol-only default path stays byte-golden
    (covered by test_packet.py)."""
    import json

    import p6_spark.sources.vv as vvmod
    from p6_spark.loader import normalize_columns
    from p6_spark.mapper import apply_mapping
    from test_packet import GENO_HEADER

    row = (
        "XXXXYYYY1", "u@example.com", "1", "16", "100", "100", "A", "G",
        "ABCC6", "chr16:g.100A>G", "NM_000000.0:c.100A>G",
        "NP_000000.0:p.Lys67Asn", "het", "inherited",
    )
    geno = normalize_columns(
        spark.createDataFrame([row], ", ".join(f"`{c}` string" for c in GENO_HEADER))
    )
    monkeypatch.setenv("P6_SPARK_ENRICH_GENE_XREFS", "1")
    monkeypatch.setattr(vvmod, "DEFAULT_TRANSPORT", mock_transport_ok)
    result = apply_mapping(spark, {"genotype": geno})
    [doc] = [json.loads(s) for s in result.packets.toJSON().collect()]
    gc = doc["interpretations"][0]["diagnosis"]["genomicInterpretations"][0][
        "variantInterpretation"
    ]["variationDescriptor"]["geneContext"]
    assert gc == {
        "valueId": "HGNC:5",
        "symbol": "ABCC6",
        "alternateIds": ["ENSG_ABCC6"],
    }

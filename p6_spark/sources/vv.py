"""VariantValidator gene-xref enrichment — the opt-in S9/J4 stage.

Reference parity (/root/reference/src/P6/vv_lookup.py:1-223): an
optional enrichment layer that attaches gene cross-references (HGNC id,
Ensembl gene id, canonical transcript accessions) AFTER the core
normalization path; v2 endpoint preferred with v1 fallback; small
exponential retry/backoff; memoized per gene; any failure raises
``VVLookupError`` for the caller to catch. The reference ships the
client but never wires it into the pipeline (its
``P6_ENRICH_GENE_XREFS`` flag is documented, unused); this module keeps
the same default-off posture and additionally provides the Spark-shaped
wiring the reference lacks:

- ``gene_xrefs_table``: the 100 TB design — DEDUPE the gene keys first
  (distinct gene symbols are HGNC-bounded, ~20k at any corpus size),
  fetch once per key EXECUTOR-SIDE through an Arrow ``mapInPandas``
  stage with a per-process memo, then broadcast-join the tiny xref
  table back. The fact table never waits on HTTP; the network cost is
  O(distinct genes), not O(rows).
- ``enrich_genotypes_with_xrefs``: flag-gated attach
  (``P6_SPARK_ENRICH_GENE_XREFS=1``); flag-off returns the input
  UNCHANGED so default packet output stays byte-golden.

Transport is injectable (``transport(url) -> dict``) so the whole path
is testable offline (tests/test_vv.py); the default transport uses
``requests`` exactly like the reference.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator
from functools import lru_cache
from typing import Any
from urllib.parse import quote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transport = Callable[[str], dict]


class VVLookupError(RuntimeError):
    """VariantValidator enrichment lookup failed (after retries)."""


_DEFAULT_BASE = "https://rest.variantvalidator.org"

# Build-time transport hook: when set (tests / air-gapped deployments),
# gene_xrefs_table captures it into the mapInPandas closure so the
# EXECUTOR processes use it too — monkeypatching module globals on the
# driver alone never reaches re-imported executor modules. None = the
# real HTTP transport via the per-process memo.
DEFAULT_TRANSPORT: Transport | None = None
_ATTEMPTS = 4
_EMPTY: dict[str, Any] = {
    "hgnc_id": "",
    "ensembl_gene_id": "",
    "refseq_transcripts": [],
    "ensembl_transcripts": [],
}


def _base_url() -> str:
    # same override knob as the reference (vv_lookup.py:50)
    return os.getenv("VV_BASE_URL", _DEFAULT_BASE).rstrip("/")


def _default_transport(url: str) -> dict:
    import requests

    resp = requests.get(url, timeout=10.0)
    resp.raise_for_status()
    return resp.json()


def _get_json_with_retry(
    url: str, transport: Transport, sleep: Callable[[float], None] = time.sleep
) -> dict:
    """GET with the reference's retry schedule: 4 attempts, backoff
    0.25s * 2^i between them (vv_lookup.py:58-83). Raises VVLookupError
    after the last failure. Unlike the reference, the backoff is NOT
    slept after the FINAL failed attempt (the reference sleeps 2s and
    then raises anyway — dead wait that multiplies across every failing
    key in an executor-side mapInPandas partition); the schedule BETWEEN
    attempts is unchanged."""
    err: Exception | None = None
    for attempt in range(_ATTEMPTS):
        try:
            return transport(url)
        except Exception as e:  # network / HTTP / JSON-shape problems
            err = e
            if attempt < _ATTEMPTS - 1:
                sleep(0.25 * (2**attempt))
    raise VVLookupError(f"Failed GET {url}: {err}") from err


def _accessions(entries: Any) -> list[str]:
    """Accession strings from a v2-style list of {'accession': ...}."""
    if not isinstance(entries, list):
        return []
    return [
        str(e["accession"])
        for e in entries
        if isinstance(e, dict) and e.get("accession")
    ]


def _normalize_v2(payload: Any) -> dict[str, Any]:
    """Stable compact dict from a gene2transcripts_v2 response
    (vv_lookup.py:91-127 contract: hgnc_id / ensembl_gene_id /
    refseq_transcripts / ensembl_transcripts)."""
    out = {k: (list(v) if isinstance(v, list) else v) for k, v in _EMPTY.items()}
    if not isinstance(payload, dict):
        return out
    hgnc = payload.get("hgnc")
    if isinstance(hgnc, dict):
        out["hgnc_id"] = hgnc.get("hgnc_id") or hgnc.get("HGNC_ID") or ""
        out["ensembl_gene_id"] = (
            hgnc.get("ensembl_gene_id") or hgnc.get("ensembl") or ""
        )
    out["refseq_transcripts"] = _accessions(payload.get("refseq"))
    out["ensembl_transcripts"] = _accessions(payload.get("ensembl"))
    return out


def _normalize_v1(payload: Any) -> dict[str, Any]:
    """Stable compact dict from the simpler v1 response, where
    transcript lists are plain strings (vv_lookup.py:130-156)."""
    out = {k: (list(v) if isinstance(v, list) else v) for k, v in _EMPTY.items()}
    if not isinstance(payload, dict):
        return out
    out["hgnc_id"] = payload.get("hgnc_id") or payload.get("HGNC_ID") or ""
    out["ensembl_gene_id"] = payload.get("ENSEMBL") or payload.get("ensembl") or ""
    rs = payload.get("refseq") or payload.get("RefSeq") or []
    if isinstance(rs, list):
        out["refseq_transcripts"] = [s for s in rs if isinstance(s, str)]
    es = payload.get("ensembl_transcripts") or payload.get("ensembl") or []
    if isinstance(es, list):
        out["ensembl_transcripts"] = [s for s in es if isinstance(s, str)]
    return out


def get_gene_xrefs_vv(
    gene_query: str,
    genome_build: str = "GRCh38",
    transcript_set: str = "refseq",
    limit_transcripts: str = "mane",
    transport: Transport | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, Any]:
    """Fetch the compact xref dict for one HGNC symbol/id or transcript
    id — v2 endpoint first, v1 fallback when v2 comes back empty, error
    when both are empty (vv_lookup.py:164-223 semantics, same endpoint
    paths and parameter order). Memoized per (query, build, set, limit)
    via ``_memo_fetch`` when called with the default transport."""
    if not gene_query or not isinstance(gene_query, str):
        raise VVLookupError("gene_query must be a non-empty string")
    q = gene_query.strip()
    t = transport or _default_transport
    base = _base_url()
    v2_url = (
        f"{base}/VariantValidator/tools/gene2transcripts_v2/"
        f"{quote(q)}/{quote(limit_transcripts)}/{quote(transcript_set)}/"
        f"{quote(genome_build)}?content-type=application%2Fjson"
    )
    v2 = _normalize_v2(_get_json_with_retry(v2_url, t, sleep))
    if any(v2.values()):
        return v2
    v1_url = (
        f"{base}/VariantValidator/tools/gene2transcripts/"
        f"{quote(q)}?content-type=application%2Fjson"
    )
    v1 = _normalize_v1(_get_json_with_retry(v1_url, t, sleep))
    if any(v1.values()):
        return v1
    raise VVLookupError(f"No xrefs found for {gene_query!r}")


@lru_cache(maxsize=2048)  # the reference's cache size (vv_lookup.py:164)
def _memo_fetch(gene_query: str, genome_build: str) -> tuple:
    """Per-process memoized fetch with the DEFAULT transport — the memo
    each Python worker keeps so repeated keys in one executor never
    refetch. Returns a tuple (hashable) for lru_cache friendliness."""
    d = get_gene_xrefs_vv(gene_query, genome_build=genome_build)
    return (
        d["hgnc_id"],
        d["ensembl_gene_id"],
        tuple(d["refseq_transcripts"]),
        tuple(d["ensembl_transcripts"]),
    )


_XREF_SCHEMA = (
    "gene_symbol string, hgnc_id string, ensembl_gene_id string, "
    "refseq_transcripts array<string>, ensembl_transcripts array<string>, "
    "vv_ok boolean"
)


def gene_xrefs_table(
    genes: DataFrame,
    gene_col: str = "gene_symbol",
    genome_build: str = "GRCh38",
    transport: Transport | None = None,
) -> DataFrame:
    """(gene_symbol -> xrefs) lookup table, fetched executor-side.

    ``genes`` may be any DataFrame containing ``gene_col``; keys are
    DEDUPED first (the gene vocabulary is HGNC-bounded, so the distinct
    stream is tiny at any corpus size), then an Arrow ``mapInPandas``
    stage fetches each key once per partition-process (per-process
    lru memo on top). Lookup failures degrade to an empty-xref row with
    ``vv_ok = false`` — enrichment must never fail the pipeline
    (vv_lookup.py:22-23 contract)."""
    import pandas as pd

    if transport is None:
        transport = DEFAULT_TRANSPORT  # resolved at BUILD time (driver)

    def fetch_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for sym in pdf["gene_symbol"]:
                try:
                    if transport is not None:
                        d = get_gene_xrefs_vv(
                            sym, genome_build=genome_build, transport=transport
                        )
                        tup = (
                            d["hgnc_id"],
                            d["ensembl_gene_id"],
                            list(d["refseq_transcripts"]),
                            list(d["ensembl_transcripts"]),
                        )
                    else:
                        h, e, rs, es = _memo_fetch(sym, genome_build)
                        tup = (h, e, list(rs), list(es))
                    rows.append((sym, *tup, True))
                except VVLookupError:
                    rows.append((sym, "", "", [], [], False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "gene_symbol",
                    "hgnc_id",
                    "ensembl_gene_id",
                    "refseq_transcripts",
                    "ensembl_transcripts",
                    "vv_ok",
                ],
            )

    distinct = (
        genes.select(F.col(gene_col).cast("string").alias("gene_symbol"))
        .filter(F.col("gene_symbol").isNotNull() & (F.col("gene_symbol") != ""))
        .distinct()
    )
    return distinct.mapInPandas(fetch_batches, _XREF_SCHEMA)


def xrefs_enabled() -> bool:
    """The opt-in flag — default OFF, matching the reference's unwired
    default (P6_ENRICH_GENE_XREFS documented at genotype.py:25 but never
    consulted; P6_SKIP_VV defaults the whole VV path off)."""
    return os.getenv("P6_SPARK_ENRICH_GENE_XREFS", "").strip().lower() in {
        "1",
        "true",
    }


def enrich_genotypes_with_xrefs(
    genotypes: DataFrame,
    gene_col: str = "gene_symbol",
    enabled: bool | None = None,
    transport: Transport | None = None,
) -> DataFrame:
    """Attach ``hgnc_id``/``ensembl_gene_id`` columns to a genotype
    stream by broadcast-joining the deduped xref table back. Flag-off
    (the default) returns the input DataFrame UNCHANGED — packet output
    stays byte-golden; flag-on adds columns that
    ``operators/packet.assemble_phenopackets`` folds into geneContext
    when present."""
    on = xrefs_enabled() if enabled is None else enabled
    if not on:
        return genotypes
    xr = gene_xrefs_table(genotypes, gene_col=gene_col, transport=transport)
    lookup = xr.select(
        F.col("gene_symbol").alias(gene_col), "hgnc_id", "ensembl_gene_id"
    )
    return genotypes.join(F.broadcast(lookup), gene_col, "left")

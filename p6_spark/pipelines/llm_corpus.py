"""End-to-end LLM training-corpus preparation: the composition the
individual operators exist for.

    raw documents
      -> quality gate      (cheap column math, no shuffle)
      -> exact dedup       (one shuffle on the text hash)
      -> near dedup        (MinHash -> LSH bands -> greedy drop)
      -> enrichment        (token counts, language, fingerprint)
      -> partitioned sink  (hive layout by language)

Every stage is a DataFrame -> DataFrame function with no driver-side
data movement, so the same composition runs at sf0.001 and at 100 TB —
only the shuffle sizing changes. Near-dup removal is greedy
keep-the-smaller-id: for every candidate pair (a < b) that LSH
surfaces, b is dropped. (A union-find pass over the pair list would
keep exactly one doc per connected component; greedy drop is the
standard one-shuffle approximation and never keeps BOTH sides of a
detected duplicate pair.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p6_spark.operators import dedup as dd
from p6_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_columns,
    token_count,
)


@dataclass
class CorpusStats:
    n_raw: int
    n_after_quality: int
    n_after_exact: int
    n_after_near: int


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    max_digit_ratio: float = 0.5,
) -> DataFrame:
    """Drop documents failing cheap quality heuristics — the first pass
    because it's shuffle-free and cuts everything downstream."""
    q = quality_columns(F.col(text_col))
    return (
        docs.withColumn("_n_tok", q["n_tokens"])
        .withColumn("_punct", q["punct_ratio"])
        .withColumn("_digit", q["digit_ratio"])
        .filter(
            (F.col("_n_tok") >= min_tokens)
            & (F.col("_punct") <= max_punct_ratio)
            & (F.col("_digit") <= max_digit_ratio)
        )
        .drop("_n_tok", "_punct", "_digit")
    )


def drop_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = 20,
) -> DataFrame:
    """MinHash-LSH near-dedup: drop the larger id of every candidate
    pair (greedy; see module docstring). Buckets larger than
    ``max_bucket`` are skipped (non-discriminative; see
    operators/dedup.lsh_candidate_pairs — the round-4 scaling sweep
    showed uncapped buckets going quadratic on a low-entropy corpus).

    .. versionchanged:: round 4
       The default changed from ``max_bucket=None`` (uncapped) to
       ``max_bucket=20``: pairs inside larger-than-cap buckets no longer
       drop documents. Pass ``max_bucket=None`` explicitly to restore
       the old exhaustive behavior on small/trusted corpora. All in-repo
       call sites and their DuckDB oracles were updated in lockstep."""
    sigs = dd.minhash_signatures(docs, id_col, text_col, num_hashes)
    pairs = dd.lsh_candidate_pairs(
        sigs, id_col, num_hashes, band_size, max_bucket=max_bucket
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def enrich(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_ws_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("doc_fingerprint"),
    )


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_path: str | None = None,
    partition_col: str = "lang_pred",
) -> tuple[DataFrame, CorpusStats]:
    """Run the full pipeline; optionally write the hive-partitioned
    result. Returns (enriched clean corpus, per-stage counts)."""
    n_raw = docs.count()
    gated = quality_gate(docs, text_col)
    n_quality = gated.count()
    exact = dd.dedup_exact(gated, text_col, id_col)
    n_exact = exact.count()
    near = drop_near_duplicates(exact, id_col, text_col)
    n_near = near.count()
    out = enrich(near, text_col)
    if out_path is not None:
        from p6_spark.sources.sinks import write_partitioned

        write_partitioned(out, out_path, [partition_col])
    return out, CorpusStats(n_raw, n_quality, n_exact, n_near)

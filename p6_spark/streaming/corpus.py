"""Structured Streaming corpus ingest — the incremental spelling of the
LLM data pipeline (batch version: pipelines/llm_corpus.py).

A file stream of document parquet flows through the same codegen quality
columns the batch path uses (operators/text.quality_columns), a rule
filter, and content-hash exact dedup; foreachBatch lands accepted docs
plus a per-batch audit row. On a real deployment the source is a landing
bucket / Kafka topic and each micro-batch is one ingest increment — the
transformations are identical by construction, which the batch-parity
test (tests/test_streaming_corpus.py) pins.

Dedup state: content_md5 keys. With availableNow (bounded backfill) the
state is corpus-bounded like the batch distinct; a forever-running ingest
would add an ingest-time watermark + dropDuplicatesWithinWatermark to
bound it (the events stream demonstrates that variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_documents_stream(spark, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def ingest_filter(docs: DataFrame) -> DataFrame:
    """Quality rules + content identity — identical expression tree for
    batch and stream (pure Column exprs, no Python). The rule thresholds
    are cross-multiplied integers (digit_ratio <= 0.3 as n_digit*10 <=
    n_chars*3; stopword_ratio >= 0.05 as n_stop*20 >= n_tokens), so the
    decisions are exact on every engine — the DuckDB twin is
    pipe_ingest_stats."""
    from p6_spark.operators.text import STOPWORDS, tokens

    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    base = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("content_md5"),
        F.length("text").cast("long").alias("n_chars_m"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long").alias("n_digit"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
        .cast("long")
        .alias("n_stop"),
    )
    return base.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("n_digit") * 10 <= F.col("n_chars_m") * 3)
        & (F.col("n_stop") * 20 >= F.col("n_tokens"))
    )


def corpus_ingest_stream(docs: DataFrame) -> DataFrame:
    """Filter + exact dedup on content hash (first writer wins)."""
    return ingest_filter(docs).dropDuplicates(["content_md5"])

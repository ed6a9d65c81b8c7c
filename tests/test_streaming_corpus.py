"""Streaming corpus ingest must equal its batch twin: same quality
filter, same content-hash dedup, same accepted doc set."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.sources.tables import load_table
from p6_spark.streaming.corpus import (
    corpus_ingest_stream,
    ingest_filter,
    read_documents_stream,
)
from p6_spark.streaming.events import run_to_memory


def test_corpus_ingest_stream_equals_batch(spark, sf_dir):
    stream = corpus_ingest_stream(read_documents_stream(spark, sf_dir))
    run_to_memory(stream, "corpus_ingest")
    got = spark.sql("select * from corpus_ingest").collect()
    got_hashes = {r["content_md5"] for r in got}
    # stream-side dedup keeps exactly one row per content hash
    assert len(got) == len(got_hashes) > 0

    docs = load_table(spark, sf_dir, "documents")
    batch = ingest_filter(docs)
    want_hashes = {r["content_md5"] for r in batch.collect()}
    # same accepted content set (dedup collapses identical texts)
    assert got_hashes == want_hashes
    # every emitted row passes the rules (exact integer forms)
    for r in got:
        assert r["n_tokens"] >= 5
        assert r["n_digit"] * 10 <= r["n_chars_m"] * 3
        assert r["n_stop"] * 20 >= r["n_tokens"]


def test_corpus_ingest_filter_rejects(spark):
    bad = spark.createDataFrame(
        [
            (1, "x", "en", "s", 1),                       # too few tokens
            (2, "1 2 3 4 5 6 7 8 9 10", "en", "s", 20),   # all digits
            (3, "the a value table row and more words here ok", "en", "s", 44),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = ingest_filter(bad).collect()
    assert [r["doc_id"] for r in out] == [3]

"""Stream-static incremental near-dedup probe (streaming/corpus.py,
round 6): the streaming path must equal the same plan run on a batch
DataFrame row-for-row, and the per-row higher-order minhash must equal
the aggregate operators/dedup.minhash_signatures bit-for-bit — the two
pins that make the stream the batch query's (dd_incremental_neardup)
faithful incremental spelling."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.operators import dedup as dd
from p6_spark.sources.tables import load_table
from p6_spark.streaming.corpus import (
    incremental_probe_stream,
    read_documents_stream,
    rowwise_minhash_cols,
)
from p6_spark.streaming.events import run_to_memory

def _is_batch():
    return F.col("doc_id") % 4 == 0


def _key(rows):
    return {(r["b_id"], r["c_id"], r["jac_x1e6"], r["is_match"]) for r in rows}


def test_probe_stream_equals_batch(spark, sf_dir):
    corpus = load_table(spark, sf_dir, "documents").filter(~_is_batch())

    stream = incremental_probe_stream(
        read_documents_stream(spark, sf_dir).filter(_is_batch()), corpus
    )
    run_to_memory(stream, "inc_probe")
    got = spark.sql("select * from inc_probe").collect()

    batch_in = load_table(spark, sf_dir, "documents").filter(_is_batch())
    want = incremental_probe_stream(batch_in, corpus).collect()

    assert len(got) == len(want) > 0
    assert _key(got) == _key(want)
    # pair keys are unique (the dedup state did its job across batches)
    assert len({(r["b_id"], r["c_id"]) for r in got}) == len(got)
    # every probe hit lands on a corpus doc, never a batch doc
    assert all(r["c_id"] % 4 != 0 for r in got)
    # at least one confirmed near-dup exists in the harness corpus
    assert any(r["is_match"] for r in got)


def test_rowwise_minhash_equals_aggregate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hcols = rowwise_minhash_cols(F.col("text"))
    per_row = docs.select(
        "doc_id", *[v.alias(k) for k, v in hcols.items()]
    ).filter(F.col("h0").isNotNull())
    agg = dd.minhash_signatures(docs)
    cols = ["doc_id"] + [f"h{i}" for i in range(8)]
    a = {tuple(r) for r in per_row.select(*cols).collect()}
    b = {tuple(r) for r in agg.select(*cols).collect()}
    assert a == b and len(a) > 0


def test_probe_jaccard_is_exact(spark):
    # hand-computed confirm: 4-token docs sharing 3 tokens -> J = 3/5
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (4, "alpha beta gamma epsilon"),
            (8, "zz yy xx ww"),
            # permuted identical token SET -> identical minhash signature
            # -> every band collides, the pair is GUARANTEED to surface
            (12, "delta gamma beta alpha"),
        ],
        "doc_id long, text string",
    )
    rows = incremental_probe_stream(batch, corpus).collect()
    by_pair = {(r["b_id"], r["c_id"]): r for r in rows}
    r = by_pair[(12, 1)]
    assert r["jac_x1e6"] == 1000000 and bool(r["is_match"]) is True
    if (4, 1) in by_pair:  # bands must collide for this pair to surface
        r = by_pair[(4, 1)]
        assert r["jac_x1e6"] == 3 * 1000000 // 5 == 600000
        assert bool(r["is_match"]) is True
    # the disjoint doc can never confirm
    assert all(not r["is_match"] for r in rows if r["b_id"] == 8)


def test_incremental_ingest_sink_equals_batch_funnel(spark, sf_dir, tmp_path):
    from p6_spark.plans.registry import QUERIES, get_queries
    from p6_spark.streaming.corpus import incremental_ingest_sink

    get_queries()
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(~_is_batch())
    out, ckpt = str(tmp_path / "accepted"), str(tmp_path / "ckpt")
    q = incremental_ingest_sink(
        read_documents_stream(spark, sf_dir).filter(_is_batch()), corpus, out, ckpt
    )
    q.awaitTermination()
    got = spark.read.parquet(out).collect()
    got_md5 = {r["content_md5"] for r in got}
    # one accepted row per content (the stream dedup held across batches)
    assert len(got) == len(got_md5) > 0

    # count parity with the registered batch funnel's final stage
    funnel = {
        r["stage"]: r
        for r in QUERIES["pipe_incremental_ingest"].build(spark, sf_dir).collect()
    }
    assert len(got) == funnel["3_neardup"]["n_out"]

    # content parity: rebuild the batch survivors' md5 set stage by stage
    # (representatives may differ — stream keeps first-seen, batch keeps
    # min doc_id — but identical text means identical probe decisions,
    # so the accepted CONTENT set must match exactly)
    from p6_spark.streaming.corpus import ingest_filter

    batch = docs.filter(_is_batch())
    gated = ingest_filter(batch).select("doc_id", "content_md5")
    keep = gated.groupBy("content_md5").agg(F.min("doc_id").alias("doc_id"))
    cmd5 = corpus.select(F.md5("text").alias("content_md5")).distinct()
    s2 = keep.join(cmd5, "content_md5", "left_anti")
    s2_docs = s2.join(docs.select("doc_id", "text"), "doc_id")
    matched = (
        incremental_probe_stream(s2_docs, corpus)
        .filter(F.col("is_match"))
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    s3 = s2_docs.join(matched, "doc_id", "left_anti")
    want_md5 = {r["content_md5"] for r in s3.select("content_md5").collect()}
    assert got_md5 == want_md5

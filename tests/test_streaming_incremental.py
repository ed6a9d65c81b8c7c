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

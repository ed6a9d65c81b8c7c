"""Planted-duplicate RECALL gates for every LSH/blocking family — the
lower-bound counterpart of tests/test_pair_growth.py (VERDICT r6 items
1-2): the pair-growth gate bounds candidate volume ABOVE (no quadratic
blowup), but nothing bounded it BELOW — a blocking stage whose buckets
all exceed the cap produces ZERO pairs, which is perfectly linear
growth and therefore invisible to that gate. That is exactly how the
old designs failed at scale:

- embedding LSH clamped its signature at 16 planes, so past
  ~20 * 2^16 ≈ 1.3M vectors every uniformly-filled bucket exceeded the
  20-member cap and was dropped — candidate recall collapsed to ~0 at
  precisely the corpus sizes the operator exists for;
- 16-bit SimHash split into 8-bit pigeonhole blocks has 512 buckets
  TOTAL — the same cliff at ~10k documents.

Each gate here synthesizes a corpus LARGER than the old design's cliff
(deterministic hash-generated content, no I/O), plants k known
duplicate pairs, runs the REAL candidate stage, and asserts it recovers
at least a stated floor. Exact duplicates share every signature by
construction, so the only legitimate loss is the max-bucket cap — a
recall collapse means the blocking key's cardinality stopped scaling
with the corpus. Self-checks prove the old clamped designs FAIL these
gates (red-forever for the whole defect class).

Covenant: every new LSH/blocking family must add a planted-duplicate
gate here alongside its pair-growth entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# embedding LSH (lsh_candidate_vec_pairs): 5M vectors, above the old
# 16-plane cliff at ~1.3M
# ---------------------------------------------------------------------------

_VEC_N = 5_000_000
_VEC_DIM = 16
_VEC_K = 200
_VEC_OFF = 10_000_000


def _planted_vec_corpus(spark):
    """5M deterministic vectors + 200 exact duplicates (ids i and
    i + _VEC_OFF share a vector). Components are hash-derived doubles
    centered on 0 so hyperplane sign bits are balanced; localCheckpoint
    so both the healthy and the clamped candidate stage reuse one
    materialization."""
    vec = F.expr(
        f"transform(sequence(0, {_VEC_DIM - 1}), "
        f"j -> cast(pmod(hash(id * {_VEC_DIM} + j), 1000) as double) / 1000.0 - 0.5)"
    )
    base = spark.range(_VEC_N).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    dups = spark.range(_VEC_K).select(
        (F.col("id") + _VEC_OFF).alias("vec_id"), vec.alias("embedding")
    )
    return base.unionByName(dups).localCheckpoint()


def _planted_vec_recall(pairs) -> int:
    return pairs.filter(
        (F.col("id_b") - F.col("id_a") == _VEC_OFF) & (F.col("id_a") < _VEC_K)
    ).count()


def test_embedding_lsh_recall_at_5m(spark):
    """The round-7 design (48-plane ceiling, runtime-conditional width)
    must recover planted exact duplicates at 5M vectors. Losses come
    only from the 20-member bucket cap on this deliberately low-dim
    (concentrated) corpus; 4 OR-amplified tables keep recall >= 0.8.
    The old 16-plane clamp fails this corpus (next test)."""
    corpus = _planted_vec_corpus(spark)
    try:
        from p6_spark.operators.similarity import lsh_candidate_vec_pairs

        hits = _planted_vec_recall(lsh_candidate_vec_pairs(corpus))
        assert hits >= 0.8 * _VEC_K, (
            f"embedding-LSH candidate recall collapsed at n={_VEC_N}: "
            f"{hits}/{_VEC_K} planted duplicates recovered. Exact dups "
            "share every signature, so this means the bucket cap is "
            "dropping ~all buckets — the signature width stopped "
            "scaling with the corpus (the r6 16-plane cliff class)."
        )
    finally:
        corpus.unpersist()


def test_embedding_lsh_16_plane_clamp_fails_at_5m(spark):
    """Self-check: the pre-round-7 16-plane clamp must FAIL the recall
    floor on the same corpus — at n=5M every 16-bit bucket holds ~76
    rows, the 20-member cap drops essentially all of them, and recall
    collapses. Proves this gate catches the defect class the
    pair-growth gate structurally cannot see (zero pairs grow
    linearly). Uses 2 tables: fewer tables can only help the clamped
    design LOOK worse, never better, and halves the runtime."""
    corpus = _planted_vec_corpus(spark)
    try:
        from p6_spark.operators.similarity import lsh_candidate_vec_pairs

        hits = _planted_vec_recall(
            lsh_candidate_vec_pairs(corpus, num_tables=2, max_planes=16)
        )
        assert hits < 0.5 * _VEC_K, (
            "expected the 16-plane clamp to lose most planted duplicates "
            f"at n={_VEC_N} (got {hits}/{_VEC_K}); if this passes, the "
            "corpus no longer reproduces the cliff — recalibrate"
        )
    finally:
        corpus.unpersist()


# ---------------------------------------------------------------------------
# text families: banded MinHash, 62-bit SimHash, incremental probe,
# chunk-signature — 100k synthetic documents (the old 16-bit SimHash
# cliff sat at ~10k docs)
# ---------------------------------------------------------------------------

_DOC_N = 100_000
_DOC_K = 200
_DOC_OFF = 1_000_000
_DOC_TOKS = 24


def _planted_doc_corpus(spark):
    """100k deterministic documents + 200 exact duplicates. Tokens are
    drawn from a 50k-word hash-derived vocabulary, so minhash/simhash
    values have real entropy (the harness corpus's ~30-word vocabulary
    is the degenerate case the bucket cap exists for — this gate tests
    the healthy-corpus recall path)."""
    text = F.expr(
        f"concat_ws(' ', transform(sequence(0, {_DOC_TOKS - 1}), "
        f"j -> concat('w', cast(pmod(hash(id * 37 + j), 50000) as string))))"
    )
    base = spark.range(_DOC_N).select(F.col("id").alias("doc_id"), text.alias("text"))
    dups = spark.range(_DOC_K).select(
        (F.col("id") + _DOC_OFF).alias("doc_id"), text.alias("text")
    )
    return base.unionByName(dups).localCheckpoint()


def _planted_doc_recall(pairs, a_col: str = "id_a", b_col: str = "id_b") -> int:
    return pairs.filter(
        (F.col(b_col) - F.col(a_col) == _DOC_OFF) & (F.col(a_col) < _DOC_K)
    ).count()


def test_minhash_lsh_recall_at_100k(spark):
    from p6_spark.operators import dedup as dd

    corpus = _planted_doc_corpus(spark)
    try:
        pairs = dd.lsh_candidate_pairs(
            dd.minhash_signatures(corpus), max_bucket=20
        )
        hits = _planted_doc_recall(pairs)
        assert hits >= 0.8 * _DOC_K, (
            f"banded-minhash candidate recall {hits}/{_DOC_K} at "
            f"n={_DOC_N}: band-value cardinality stopped scaling with "
            "the corpus (exact duplicates agree on every band — only "
            "the bucket cap can lose them)"
        )
    finally:
        corpus.unpersist()


def test_simhash62_block_recall_at_100k(spark):
    """The round-7 62-bit/31-bit-block SimHash must keep planted
    duplicates at 100k docs — 10x past the old 16-bit design's ~10k
    cliff (512 buckets total; proven to fail below)."""
    from p6_spark.operators import dedup as dd

    corpus = _planted_doc_corpus(spark)
    try:
        sig = dd.simhash62_table(corpus).withColumnRenamed("simhash", "s")
        hits = _planted_doc_recall(_simhash_block_pairs(sig))
        assert hits >= 0.8 * _DOC_K, (
            f"simhash62 pigeonhole-block recall {hits}/{_DOC_K} at "
            f"n={_DOC_N}: block-value cardinality stopped scaling with "
            "content entropy"
        )
    finally:
        corpus.unpersist()


def _simhash_block_pairs(sig, hi_div: int = 2**31, lo_mod: int = 2**31):
    """The dd_simhash_pairs candidate stage (parameterized block split
    so the 16-bit self-check below can reproduce the OLD design)."""
    blocked = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("blk_idx"),
                    F.expr(f"s div {hi_div}").alias("blk_val"),
                ),
                F.struct(
                    F.lit(1).alias("blk_idx"),
                    (F.col("s") % F.lit(lo_mod).cast("long")).alias("blk_val"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.blk_idx").alias("blk_idx"), F.col("b.blk_val").alias("blk_val"))
    small = (
        blocked.groupBy("blk_idx", "blk_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= 20)
        .select("blk_idx", "blk_val")
    )
    blocked = blocked.join(small, ["blk_idx", "blk_val"])
    return (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def test_simhash_16bit_blocks_fail_at_100k(spark):
    """Self-check: the pre-round-7 16-bit signature with 8-bit blocks
    (512 buckets total) must LOSE the planted duplicates at 100k docs —
    every bucket holds ~390 rows, far over the 20 cap. Reproduced by
    masking the 62-bit signature to 16 bits and splitting 8/8: a 16-bit
    simhash IS a fixed-cardinality blocking key regardless of which 16
    votes it keeps."""
    from p6_spark.operators import dedup as dd

    corpus = _planted_doc_corpus(spark)
    try:
        sig = dd.simhash62_table(corpus).select(
            "doc_id", (F.col("simhash") % F.lit(65536).cast("long")).alias("s")
        )
        hits = _planted_doc_recall(_simhash_block_pairs(sig, hi_div=256, lo_mod=256))
        assert hits < 0.5 * _DOC_K, (
            f"expected the 16-bit/8-bit-block design to collapse at "
            f"n={_DOC_N} (got {hits}/{_DOC_K}); if this passes, the "
            "corpus no longer reproduces the cliff — recalibrate"
        )
    finally:
        corpus.unpersist()


def test_incremental_probe_recall_at_100k(spark):
    """The dd_incremental_neardup candidate stage: batch bands PROBE the
    capped corpus band index. Duplicates are planted ACROSS the split —
    batch doc i + _DOC_OFF duplicates corpus doc i — matching the
    operator's actual job (is this incoming doc already in the corpus?).
    """
    from p6_spark.operators import dedup as dd

    corpus = _planted_doc_corpus(spark)
    try:
        sigs = dd.minhash_signatures(corpus)
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.concat_ws(
                        "_",
                        F.col(f"h{2 * b}").cast("string"),
                        F.col(f"h{2 * b + 1}").cast("string"),
                    ).alias("band_val"),
                )
                for b in range(4)
            ]
        )
        banded = sigs.select(
            "doc_id",
            (F.col("doc_id") >= _DOC_OFF).alias("is_batch"),
            F.explode(bands).alias("band"),
        ).select("doc_id", "is_batch", "band.band_idx", "band.band_val")
        corpus_small = (
            banded.filter(~F.col("is_batch"))
            .groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("bn"))
            .filter(F.col("bn") <= 20)
            .select("band_idx", "band_val")
        )
        corpus_b = banded.filter(~F.col("is_batch")).join(
            corpus_small, ["band_idx", "band_val"]
        )
        cand = (
            banded.filter(F.col("is_batch"))
            .select("band_idx", "band_val", F.col("doc_id").alias("b_id"))
            .join(
                corpus_b.select("band_idx", "band_val", F.col("doc_id").alias("c_id")),
                ["band_idx", "band_val"],
            )
            .select("b_id", "c_id")
            .distinct()
        )
        hits = cand.filter(
            (F.col("b_id") - F.col("c_id") == _DOC_OFF) & (F.col("c_id") < _DOC_K)
        ).count()
        assert hits >= 0.8 * _DOC_K, (
            f"incremental-probe candidate recall {hits}/{_DOC_K} at "
            f"corpus n={_DOC_N}"
        )
    finally:
        corpus.unpersist()


def test_chunk_signature_recall_at_100k(spark):
    """mm_chunk_neardup's (chunk_idx, chunk_hash) pigeonhole blocking:
    md5-of-content block values scale with content entropy, so planted
    exact duplicates must survive at 100k docs."""
    corpus = _planted_doc_corpus(spark)
    try:
        chunks, chunk_len = 8, 16
        docs = corpus.filter(F.length("text") >= chunks * chunk_len)
        blocks = [
            F.struct(
                F.lit(b).alias("b"),
                F.md5(
                    F.concat(
                        F.lit(f"ph{b}_"),
                        F.substring(F.col("text"), b * chunk_len + 1, chunk_len),
                    )
                ).alias("h"),
            )
            for b in range(chunks)
        ]
        blk = docs.select("doc_id", F.explode(F.array(*blocks)).alias("s")).select(
            "doc_id", F.col("s.b").alias("b"), F.col("s.h").alias("h")
        )
        pairs = (
            blk.alias("a")
            .join(
                blk.alias("bb"),
                (F.col("a.b") == F.col("bb.b"))
                & (F.col("a.h") == F.col("bb.h"))
                & (F.col("a.doc_id") < F.col("bb.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("bb.doc_id").alias("id_b")
            )
            .distinct()
        )
        hits = _planted_doc_recall(pairs)
        assert hits >= 0.8 * _DOC_K, (
            f"chunk-signature recall {hits}/{_DOC_K} at n={_DOC_N}"
        )
    finally:
        corpus.unpersist()

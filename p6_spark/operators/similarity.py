"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  query set broadcasts; the corpus streams; per-row cosine is a zip_with
  fold in codegen (no Python). O(|corpus| * |queries|) but perfectly
  partition-parallel — right up to a few thousand queries.
- lsh_ann_topk: random-hyperplane LSH — the scale path. Hyperplane
  components are md5-derived ±1 (deterministic, engine-portable);
  signature agreement buckets the corpus so the exact re-rank touches
  only colliding buckets instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from p6_spark.operators.text import md5_int


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, computed in double."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Cosine is rounded to 6 decimals
    BEFORE ranking (with id tiebreak) so the ranking is reproducible
    across engines and partitionings."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def hyperplane_sign(plane: int, dim_index: Column, table: int = 0) -> Column:
    """Deterministic ±1 component of pseudo-random hyperplane `plane` of
    LSH table `table` at dimension `dim_index` (md5 parity —
    reproducible in any engine)."""
    h = md5_int(
        F.concat(F.lit(f"t{table}_plane{plane}_"), dim_index.cast("string"))
    )
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _plane_signs(plane: int, table: int, dims: int = 256) -> list[float]:
    """Driver-side precompute of the hyperplane sign vector. The planes
    are DATA-INDEPENDENT (md5 parity of "t{table}_plane{plane}_{dim}"),
    so evaluating md5 per row was pure waste — 4 tables x 8 planes x 64
    dims = 2048 md5+concat calls per ROW (~4M per pass at the 2000-row
    embeddings table; round-4 registry bench flagged sim_lsh_ann at
    6.5s). Computing the same parities once in Python and embedding
    them as an array literal is bit-identical: int(md5 hex[:8], 16)
    parity == the md5_int % 2 the oracle replays."""
    import hashlib

    return [
        1.0
        if int(
            hashlib.md5(f"t{table}_plane{plane}_{d}".encode()).hexdigest()[:8],
            16,
        )
        % 2
        == 0
        else -1.0
        for d in range(dims)
    ]


def _signature_sql(
    vec_sql: str, num_planes: int, table: int, dims: int = 256
) -> str:
    """The whole bit-packed signature as ONE SQL string. Plan
    construction cost was the round-4 finding: the original per-dim
    F.lit()/per-plane Column-object build spent ~6s in py4j round-trips
    BEFORE any data moved (8192 lit calls + 64 lambda registrations).
    A single parsed expression per table costs one py4j call; the
    physical plan is identical.

    The sign vectors are precomputed to `dims` components; a vector
    LONGER than that would be silently truncated by the slice (and the
    zip_with null-pad would collapse every signature to 0 — one giant
    bucket, quadratic join). Guarded with raise_error so an oversize
    embedding fails loudly at execution instead."""
    parts = []
    for p in range(num_planes):
        signs = ",".join(f"{s:.1f}D" for s in _plane_signs(p, table, dims))
        parts.append(
            f"(case when aggregate(zip_with("
            f"transform({vec_sql}, x -> cast(x as double)), "
            f"slice(array({signs}), 1, size({vec_sql})), "
            f"(x, s) -> x * s), 0.0D, (acc, v) -> acc + v) > 0 "
            f"then {1 << p}L else 0L end)"
        )
    guard = (
        f"case when size({vec_sql}) > {dims} then "
        f"cast(raise_error(concat('lsh_signature: embedding dim ', "
        f"cast(size({vec_sql}) as string), "
        f"' exceeds the {dims} precomputed hyperplane components')) as bigint) "
    )
    return guard + "else (" + " + ".join(parts) + ") end"


def lsh_signature(
    vec_col: str, num_planes: int = 8, table: int = 0, dims: int = 256
) -> Column:
    """Bit-packed random-hyperplane signature of an embedding (plane
    sign vectors precomputed driver-side, whole signature parsed as one
    SQL expression; see _plane_signs/_signature_sql). Accepts a column
    NAME only: a Column object has no stable SQL rendering (and the
    private `_jc` escape hatch does not exist under Spark Connect), so
    anything else raises instead of interpolating wrong SQL."""
    if not isinstance(vec_col, str):
        raise TypeError(
            "lsh_signature requires a column NAME (str); Column objects "
            "have no engine-portable SQL rendering"
        )
    return F.expr(_signature_sql(vec_col, num_planes, table, dims))


def blocked_neardup_pairs(
    corpus: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.3,
    top_per_block: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: exact cosine over
    pairs within a blocking key, ranked per block.

    Blocking is the scale move — the self-join shuffles once on
    `block_col` and the quadratic comparison runs only inside blocks
    (LSH signatures serve as the blocking key when no natural one
    exists; see lsh_ann_topk). Output is deterministic: cosine rounded
    to 6 decimals before ranking, full id tiebreak, integer-scaled."""
    a = corpus.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = corpus.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "blk",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
    )
    w = W.partitionBy("blk").orderBy(F.desc("cos"), F.asc("id_a"), F.asc("id_b"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_per_block)
        .select(
            F.col("blk").alias("label"),
            "id_a",
            "id_b",
            F.round(F.col("cos") * 1000000, 0).cast("bigint").alias("cos_x1e6"),
        )
        .orderBy("label", F.desc("cos_x1e6"), "id_a", "id_b")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: equi-join on LSH signature (bucket), exact cosine
    re-rank within buckets. The signature join replaces the cross join —
    at 100 TB that is the difference between a shuffle on a long key and
    an O(n^2) explosion.

    OR-amplification: `num_tables` independent hyperplane sets; a corpus
    row is a candidate for a query if their signatures agree in ANY
    table (posexplode over per-table sigs → equi-join on (table, sig) →
    distinct candidate pairs). More tables = higher recall at linear
    index cost — the standard recall/cost dial. Recall is tested against
    brute force in tests/test_similarity.py."""
    sigs = F.array(
        *[lsh_signature(vec_col, num_planes, t) for t in range(num_tables)]
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        F.posexplode(sigs).alias("tbl", "sig"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.posexplode(sigs).alias("tbl", "sig"),
        )
    )
    scored = (
        c.join(q, ["tbl", "sig"])
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", "qvec", "cvec")
        .dropDuplicates(["query_id", "match_id"])
        .select(
            "query_id",
            "match_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )

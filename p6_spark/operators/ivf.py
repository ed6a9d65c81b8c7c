"""IVF (inverted-file) approximate nearest neighbor — the centroid-
bucketed scale path, complementing the LSH variant in similarity.py.

Build: k-means over the corpus (deterministic init: the k vectors with
the smallest md5(vec_id); a few Lloyd rounds). Assignment is an argmin
over a broadcast-literal centroid table evaluated entirely in codegen —
no shuffle, no Python. The only driver-side data is the model itself
(k x dim floats), which is how every ANN index ships its centroids.

Search: each query probes its `n_probe` nearest centroid lists; the
exact cosine re-rank touches only corpus rows in the probed lists —
|corpus| * n_probe / k of the data instead of all of it. Recall vs
brute force is tested in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from p6_spark.operators.similarity import cosine
from p6_spark.operators.text import md5_int


def _centroid_array(centroids: list[list[float]]) -> Column:
    """Literal array<struct<cid,cvec>> of the current model."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
            )
            for cid, vec in enumerate(centroids)
        ]
    )


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add `cid` = nearest centroid id. Pure column expressions: the
    distance scan over k centroids stays inside codegen."""
    carr = _centroid_array(centroids)
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = F.aggregate(
        carr,
        F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).alias("cid")
        ),
        lambda acc, c: F.when(
            _sq_dist(vecd, c["cvec"]) < acc["d"],
            F.struct(_sq_dist(vecd, c["cvec"]).alias("d"), c["cid"].alias("cid")),
        ).otherwise(acc),
    )
    return df.withColumn("cid", best["cid"])


def train_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means model. Init = the k corpus vectors with the
    smallest md5(id); each Lloyd round is one assignment pass (codegen)
    plus a (cid, dim)-grouped mean — k*dim rows to the driver."""
    seeds = (
        corpus.select(id_col, vec_col)
        .orderBy(md5_int(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(iters):
        assigned = _assign(corpus.select(vec_col), vec_col, centroids)
        means = (
            assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cid[c][p] for p in sorted(by_cid[c])] if c in by_cid else centroids[c]
            for c in range(k)
        ]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF probing: equi-join query probes to corpus
    centroid lists, exact cosine re-rank inside the probed lists."""
    model = train_centroids(corpus, k=num_centroids, id_col=id_col, vec_col=vec_col)
    indexed = _assign(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec")),
        "cvec",
        model,
    )
    # per query: the n_probe nearest centroid ids
    carr = _centroid_array(model)
    qvecd = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    dists = F.transform(
        carr,
        lambda c: F.struct(_sq_dist(qvecd, c["cvec"]).alias("d"), c["cid"].alias("cid")),
    )
    probes = F.slice(F.array_sort(dists), 1, n_probe)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
        .withColumn("cid", F.explode(F.transform(probes, lambda p: p["cid"])))
    )
    scored = (
        indexed.join(q, "cid")
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

"""Round-5 scale proofs: the sharded-pipeline mergeability proof —
``pipe_llm_corpus`` decomposed into the 100 TB operating mode
(per-shard ingest, global merge) and certified EQUAL to the single-run
output by the single-run oracle itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6_spark.plans import llm_ops  # noqa: F401  (registers pipe_llm_corpus)
from p6_spark.plans.registry import QUERIES, register
from p6_spark.sources.tables import load_table

_N_SHARDS = 4


@register(
    "pipe_sharded_merge",
    # The oracle IS the single-run pipeline's oracle: certifying the
    # sharded plan against it proves sharded == single-run exactly.
    oracle=QUERIES["pipe_llm_corpus"].oracle,
    doc="Sharded-pipeline mergeability proof (VERDICT r4 item 7): the "
    "corpus is split into 4 disjoint shards (doc_id % 4 — stands in "
    "for 4 independent ingest partitions of a 100 TB crawl); each "
    "shard runs the INGEST stages locally (quality gate + exact "
    "dedup), then the documented combine step merges: union -> "
    "re-apply keep-min exact dedup (min-of-mins == global min, the "
    "semigroup property that makes exact dedup mergeable) -> global "
    "MinHash-LSH near-dedup over the merged survivors (banding is "
    "itself one distributed shuffle, the global phase of the "
    "operating mode) -> per-row enrichment (commutes with union). "
    "Certified against pipe_llm_corpus's OWN single-run oracle, so a "
    "green row is literally 'shard-and-merge equals single run'. "
    "tests/test_llm_corpus.py additionally asserts DataFrame-level "
    "equality between the two Spark plans.",
    tags=("pipeline", "dedup", "sharding", "merge-proof"),
)
def pipe_sharded_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p6_spark.operators.dedup import dedup_exact
    from p6_spark.pipelines.llm_corpus import (
        drop_near_duplicates,
        enrich,
        quality_gate,
    )

    docs = load_table(spark, sf_dir, "documents")
    # Each shard's ingest output is localCheckpoint-ed: downstream the
    # union is referenced twice by the global exact dedup (groupBy +
    # semi-join) and several more times by the near-dedup (signatures,
    # banding, survivor join), so uncut lineage re-executed every
    # shard's gate+dedup once per reference (~17s at sf0.01 in the r5
    # sweep — the heaviest query in the registry). Cutting at the shard
    # boundary is also the honest 100 TB shape: shard outputs ARE
    # materialized artifacts in the sharded operating mode. The merged
    # survivor set is cut too before the near-dedup fan-out.
    per_shard = [
        dedup_exact(quality_gate(docs.filter(F.col("doc_id") % _N_SHARDS == i)))
        for i in range(_N_SHARDS)
    ]
    # Round-11 (guide §2.6): ONE materialization of the unioned shard
    # outputs instead of four sequential per-shard localCheckpoint
    # jobs — the four shard subplans become parallel stages of a
    # single job, so shard tails overlap instead of serializing on
    # the driver. Each shard's ingest still runs independently before
    # the union (the merge math is untouched); at 100 TB the shard
    # outputs are separate materialized writes either way.
    merged = reduce(DataFrame.unionAll, per_shard).localCheckpoint()
    global_clean = dedup_exact(merged).localCheckpoint()  # keep-min is associative
    return enrich(drop_near_duplicates(global_clean)).orderBy("doc_id")

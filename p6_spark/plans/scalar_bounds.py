"""Driver-side scalar bounds for plan selection — the ONE permitted
`.collect()` class in registered plans (with the k-sized k-means
centroids and the recursive-CTE date bounds, see modern_sql.py:89):
a 1-row count that is orders cheaper than the stage it guards and
whose value picks a join strategy (broadcast vs shuffle-hash).

Used by the decontamination family (dd_decontam_ngram13,
dd_contamination): the harness's ``doc_id % 97`` bench split GROWS
with the corpus, so the bench-shingle broadcast that is safe for a
real fixed-size benchmark set becomes an OOM cliff at 100 TB unless
the plan counts the bench docs first and degrades to a shuffle-hash
semi-join past the crossover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Broadcast/shuffle crossover for a decontam bench side, in BENCH DOCS
# (the cheap driver-side bound): ~150 words/doc -> ~3M distinct 13-gram
# shingles -> ~300 MB of broadcast strings, a comfortable executor
# ceiling. 3-gram shingle sets (dd_contamination) are DENSER per doc
# than 13-gram ones, so the same doc-count bound is strictly more
# conservative there. The harness's doc_id % 97 split is ~1% OF THE
# CORPUS, so at 100 TB the bench side alone is ~1 TB of shingles — far
# past any broadcast — and both plans must degrade to shuffle-hash.
DECON_BROADCAST_MAX_BENCH_DOCS = 20_000


def bench_doc_count(spark: SparkSession, sf_dir: str, docs: DataFrame) -> int:
    """Count bench DOCS (``doc_id % 97 == 0``) — not shingles — as a
    doc_id-only scan, memoized per (session, sf_dir) like the table
    cache so rebuilding the plan (bench reruns, partition-invariance
    sweeps) never re-pays the guard scan.

    Staleness assumption (documented per round-10 ADVICE): the memo is
    keyed only on ``sf_dir``, which is sound because every harness path
    (testdata/localdata/tmp fixtures) is written once and then read —
    nothing regenerates data under an existing path within a session.
    A caller that DOES rewrite a directory in-session must either use a
    fresh path (what the tmp_path tests do) or drop the cache entry
    (``spark._p6_decontam_bench_count.pop(sf_dir)``); otherwise the
    stale count can pick the wrong join strategy — worst case
    re-broadcasting a side that has grown past the crossover.
    """
    cache = getattr(spark, "_p6_decontam_bench_count", None)
    if cache is None:
        cache = {}
        spark._p6_decontam_bench_count = cache
    n_bench_docs = cache.get(sf_dir)
    if n_bench_docs is None:
        n_bench_docs = docs.filter(F.col("doc_id") % 97 == 0).count()
        cache[sf_dir] = n_bench_docs
    return n_bench_docs

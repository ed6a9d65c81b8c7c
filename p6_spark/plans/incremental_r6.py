"""Incremental ingest near-dedup (round 6): dedupe a NEW batch against
an EXISTING corpus without ever self-joining the corpus.

Every shipped near-dup operator so far is corpus-vs-itself (self-join
over LSH buckets). Production ingest is different: the corpus is
already deduped and indexed; each increment (a crawl drop, a day of
uploads) must be checked against it. The scale shape changes from a
self-join to a PROBE join — candidates are (batch x corpus-bucket)
collisions, bounded by cap x bands x batch rows, LINEAR in the
increment and independent of corpus size. The corpus-side banded index
is built once and reused across increments (here it is rebuilt because
each registry query is self-contained).

Reference: the reference's dedup is exact-ish per-packet
(/root/reference/src/P6/genotype.py:334-354); this is the corpus-scale
incremental generalization of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6_spark.plans.llm_ops import _SQL_TOKENS, _sql_minhash_sig
from p6_spark.plans.registry import register
from p6_spark.sources.tables import load_table

_CAP = 20
_TAU_X1E6 = 500000  # exact-Jaccard confirm threshold (0.5)


@register(
    "dd_incremental_neardup",
    oracle=f"""
WITH {_sql_minhash_sig('TRUE')},
bands AS (
  SELECT doc_id, doc_id % 4 = 0 AS is_batch, band_idx, band_val
  FROM (
    SELECT doc_id, 0 AS band_idx, cast(h0 AS varchar) || '_' || cast(h1 AS varchar) AS band_val FROM sig
    UNION ALL
    SELECT doc_id, 1, cast(h2 AS varchar) || '_' || cast(h3 AS varchar) FROM sig
    UNION ALL
    SELECT doc_id, 2, cast(h4 AS varchar) || '_' || cast(h5 AS varchar) FROM sig
    UNION ALL
    SELECT doc_id, 3, cast(h6 AS varchar) || '_' || cast(h7 AS varchar) FROM sig
  )
),
corpus_small AS MATERIALIZED (
  SELECT band_idx, band_val FROM bands WHERE NOT is_batch
  GROUP BY band_idx, band_val HAVING count(*) <= {_CAP}
),
cand AS MATERIALIZED (
  SELECT DISTINCT b.doc_id AS b_id, c.doc_id AS c_id
  FROM bands b
  JOIN (SELECT bb.* FROM bands bb JOIN corpus_small USING (band_idx, band_val)
        WHERE NOT bb.is_batch) c
    USING (band_idx, band_val)
  WHERE b.is_batch
),
-- per-doc distinct-token LISTS + list_intersect, not a toks-x-toks row
-- join: at sf1.0 the row-join form spilled >15 GB (cand x tokens x
-- tokens intermediate); the list form carries two ~50-element lists
-- per candidate row instead. Same n_common by construction.
tlists AS MATERIALIZED (
  SELECT doc_id, list(tok) AS tl, cast(count(*) AS bigint) AS n_tok
  FROM toks GROUP BY doc_id
),
scored AS (
  SELECT b_id, c_id,
         (n_common * 1000000) // (n_a + n_b - n_common) AS jac_x1e6
  FROM (
    SELECT cand.b_id, cand.c_id,
           cast(len(list_intersect(a.tl, b.tl)) AS bigint) AS n_common,
           a.n_tok AS n_a, b.n_tok AS n_b
    FROM cand
    JOIN tlists a ON a.doc_id = cand.b_id
    JOIN tlists b ON b.doc_id = cand.c_id
  )
)
SELECT d.doc_id,
       cast(coalesce(count(s.c_id), 0) AS bigint) AS n_candidates,
       cast(coalesce(count(s.c_id) FILTER (WHERE s.jac_x1e6 >= {_TAU_X1E6}), 0) AS bigint)
         AS n_matches,
       coalesce(count(s.c_id) FILTER (WHERE s.jac_x1e6 >= {_TAU_X1E6}), 0) > 0 AS dropped
FROM documents d
LEFT JOIN scored s ON s.b_id = d.doc_id
WHERE d.doc_id % 4 = 0
GROUP BY d.doc_id
ORDER BY d.doc_id
""",
    doc="Incremental ingest near-dedup: the new batch (doc_id % 4 = 0 — "
    "an SF-stable 25% increment) probes the EXISTING corpus's banded "
    "minhash index instead of self-joining. Corpus buckets above "
    f"{_CAP} members are dropped before the probe (non-discriminative "
    "mass, the lsh_candidate_pairs discipline), so candidates are "
    f"bounded at {_CAP} x 4 bands x batch rows — LINEAR in the "
    "increment and independent of corpus size; at 100 TB the corpus "
    "index is built once and reused per increment. Candidates are "
    "confirmed with exact distinct-token Jaccard (x1e6 floor-div "
    "integers, tau=0.5) and every batch doc reports "
    "(n_candidates, n_matches, dropped) — the funnel numbers an "
    "ingest audit logs. Zero-candidate docs appear with zeros via the "
    "left join, so the report is total over the batch.",
    tags=("dedup", "lsh", "incremental", "pipeline"),
)
def dd_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p6_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 4 == 0
    sigs = dd.minhash_signatures(docs)

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
        "doc_id", is_batch.alias("is_batch"), F.explode(bands).alias("band")
    ).select("doc_id", "is_batch", "band.band_idx", "band.band_val")
    # banded feeds three subtrees (corpus cap, corpus probe side, batch
    # probe side) — cut the lineage or the signature explode runs 3x
    banded = banded.localCheckpoint()

    corpus_small = (
        banded.filter(~F.col("is_batch"))
        .groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= _CAP)
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

    toks = dd.distinct_tokens(docs, "doc_id", "text").localCheckpoint()
    tsz = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    inter = (
        cand.join(
            toks.select(F.col("doc_id").alias("b_id"), "tok"), "b_id"
        )
        .join(
            toks.select(F.col("doc_id").alias("c_id"), "tok"),
            ["c_id", "tok"],
        )
        .groupBy("b_id", "c_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        cand.join(inter, ["b_id", "c_id"], "left")
        .join(
            tsz.select(F.col("doc_id").alias("b_id"), F.col("n_tok").alias("n_a")),
            "b_id",
        )
        .join(
            tsz.select(F.col("doc_id").alias("c_id"), F.col("n_tok").alias("n_b")),
            "c_id",
        )
        .select(
            "b_id",
            "c_id",
            F.expr(
                "(coalesce(n_common, 0) * 1000000)"
                " div (n_a + n_b - coalesce(n_common, 0))"
            ).alias("jac_x1e6"),
        )
    )
    report = (
        docs.filter(is_batch)
        .select("doc_id")
        .join(scored.withColumnRenamed("b_id", "doc_id"), "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.count("c_id"), F.lit(0)).alias("n_candidates"),
            F.coalesce(
                F.count(F.when(F.col("jac_x1e6") >= _TAU_X1E6, 1)), F.lit(0)
            ).alias("n_matches"),
            (
                F.coalesce(
                    F.count(F.when(F.col("jac_x1e6") >= _TAU_X1E6, 1)), F.lit(0)
                )
                > 0
            ).alias("dropped"),
        )
        .orderBy("doc_id")
    )
    return report

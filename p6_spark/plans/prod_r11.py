"""Round-11 productionization: dead-letter twins for the mixture-
planning family (VERDICT r10 item 3).

``pipe_domain_mixture`` and ``pipe_data_epochs`` got named-raise guards
this round (a language whose in-mixture documents sum to zero/NULL
chars reaches ``div avail_chars`` — DuckDB ``// 0`` is NULL, Spark ANSI
div raises, the exact silent-drift class the r10 fuzz sweep caught).
The raising posture is right for oracle parity, but at 100 TB one
shard of char-stripped documents must not abort a mixture plan: the
reference's error-channel semantics drop the ROW, never the RUN
(src/P6/__main__.py:258-268), and these ``*_deadletter`` twins route
zero/NULL-char documents through ``audit.dead_letter_rows`` (null-safe
as of r11) into per-language rejection counts instead.

Twin semantics beyond the raising forms:
- The report spine is the 5-row LITERAL weight table, so a language
  whose documents are ALL dirty still appears (zero available mass,
  sentinel -1 rate/epochs) rather than silently vanishing and letting
  the water-fill/total quietly recompute over the remainder — for a
  mixture planner, a supply hole is a planning fact, not an error.
- All mass totals (water-fill min, 2x demand target) are computed over
  CLEAN documents only, so one blank shard cannot shift the plan.

On a clean corpus each twin equals its raising form plus an all-zero
n_deadletter column (tests/test_deadletter_r11.py pins this, along with
dirty-corpus oracle parity where the raising forms abort).

House conventions: wide products staged decimal(38,0)/HUGEINT, every
trunc-division quotient int64-bounded, every column aliased identically
in both engines, final SELECT columns cast bigint (HUGEINT->float64
pandas trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6_spark.audit import dead_letter_rows
from p6_spark.plans.packing_r7 import _MIX_W
from p6_spark.plans.registry import register
from p6_spark.plans.rigor_r9 import _EPOCH_CAP
from p6_spark.sources.tables import load_table

_SQL_W_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_W.items())

_SQL_CLEAN_DEAD = f"""
base AS (
  SELECT lang, n_chars FROM documents WHERE lang IN {tuple(_MIX_W)!r}
),
clean AS (
  SELECT lang, n_chars FROM base WHERE n_chars IS NOT NULL AND n_chars >= 1
),
dead AS (
  -- NOT coalesce(pred, false): NULL n_chars routes to the dead side,
  -- mirroring audit.dead_letter_rows' null-safe split
  SELECT lang, cast(count(*) AS bigint) AS n_deadletter
  FROM base WHERE NOT coalesce(n_chars >= 1, false) GROUP BY lang
),
w AS (
  SELECT * FROM (VALUES {_SQL_W_VALUES}) AS t(lang, w_x1e6)
),
avail AS (
  SELECT lang, cast(sum(n_chars) AS bigint) AS avail_chars
  FROM clean GROUP BY lang
),
spine AS (
  SELECT w.lang, cast(w.w_x1e6 AS bigint) AS w_x1e6,
         coalesce(a.avail_chars, 0) AS avail_chars
  FROM w LEFT JOIN avail a USING (lang)
)"""


def _clean_dead_spine(spark: SparkSession, sf_dir: str):
    """Shared Spark front-end: null-safe dead-letter split of the
    in-mixture documents, clean per-language mass joined onto the
    5-row literal weight spine, per-language dead counts."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("lang").isin(list(_MIX_W))).select(
        "lang", "n_chars"
    )
    clean, dead = dead_letter_rows(
        base, F.col("n_chars").isNotNull() & (F.col("n_chars") >= 1)
    )
    avail = clean.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("avail_chars")
    )
    w = spark.createDataFrame(
        list(_MIX_W.items()), "lang string, w_x1e6 long"
    )
    # the weight spine and the aggregated sides are all <= 5 rows;
    # broadcast the aggregates onto the literal spine
    spine = w.join(F.broadcast(avail), "lang", "left").select(
        "lang",
        "w_x1e6",
        F.coalesce("avail_chars", F.lit(0).cast("long")).alias("avail_chars"),
    )
    dead_counts = dead.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_deadletter")
    )
    return spine, dead_counts


@register(
    "pipe_domain_mixture_deadletter",
    oracle=f"""
WITH {_SQL_CLEAN_DEAD},
joined AS (
  SELECT lang, avail_chars, w_x1e6,
         (avail_chars::HUGEINT * 1000000) // w_x1e6 AS max_total
  FROM spine
),
t AS (SELECT min(max_total) AS total_chars FROM joined)
SELECT j.lang, j.avail_chars, j.w_x1e6,
       cast((t.total_chars::HUGEINT * j.w_x1e6) // 1000000 AS bigint)
         AS take_chars,
       CASE WHEN j.avail_chars = 0 THEN cast(-1 AS bigint)
            ELSE cast((((t.total_chars::HUGEINT * j.w_x1e6) // 1000000)
                       * 1000000) // j.avail_chars AS bigint)
       END AS rate_x1e6,
       coalesce(d.n_deadletter, 0) AS n_deadletter
FROM joined j CROSS JOIN t LEFT JOIN dead d ON j.lang = d.lang
ORDER BY j.lang
""",
    doc="Dead-letter twin of pipe_domain_mixture — the same exact "
    "water-fill (largest total satisfying the x1e6 mixture without "
    "oversampling any language), but zero/NULL-char documents are "
    "ROUTED through audit.dead_letter_rows (§2.9 error-channel-as-"
    "data; reference drop-rows-never-runs, src/P6/__main__.py:258-268) "
    "into a per-language n_deadletter count instead of tripping the "
    "raising form's zero-mass guard. The report spine is the literal "
    "weight table, so a language with NO clean mass still appears — "
    "avail 0 binds the water-fill to total 0 (you cannot satisfy an "
    "exact mixture with an empty supply) with rate_x1e6 = -1 sentinel "
    "— rather than silently vanishing from the plan. Available mass "
    "is CLEAN documents only. On a clean corpus equals the raising "
    "form + an all-zero n_deadletter column "
    "(tests/test_deadletter_r11.py). Scale shape identical: one scan "
    "splits clean/dead, one hash aggregate per side to <= |langs| "
    "rows, broadcast 5-row arithmetic.",
    tags=("pipeline", "mixture", "training", "fixed-point", "audit"),
)
def pipe_domain_mixture_deadletter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spine, dead_counts = _clean_dead_spine(spark, sf_dir)
    joined = spine.withColumn(
        "max_total",
        F.expr("(cast(avail_chars as decimal(38,0)) * 1000000) div w_x1e6"),
    )
    t = joined.agg(F.min("max_total").alias("total_chars"))
    take = "(cast(total_chars as decimal(38,0)) * w_x1e6) div 1000000"
    return (
        joined.crossJoin(F.broadcast(t))
        .join(F.broadcast(dead_counts), "lang", "left")
        .select(
            "lang",
            "avail_chars",
            "w_x1e6",
            F.expr(take).alias("take_chars"),
            F.when(F.col("avail_chars") == 0, F.lit(-1).cast("long"))
            .otherwise(
                F.expr(
                    f"(cast(({take}) as decimal(38,0)) * 1000000)"
                    " div avail_chars"
                )
            )
            .alias("rate_x1e6"),
            F.coalesce("n_deadletter", F.lit(0).cast("long")).alias(
                "n_deadletter"
            ),
        )
        .orderBy("lang")
    )


@register(
    "pipe_data_epochs_deadletter",
    oracle=f"""
WITH {_SQL_CLEAN_DEAD},
t AS (SELECT 2 * sum(avail_chars) AS total_target FROM spine),
plan AS (
  SELECT s.lang, s.avail_chars,
         cast((t.total_target::HUGEINT * s.w_x1e6) // 1000000 AS bigint)
           AS target_chars
  FROM spine s CROSS JOIN t
)
SELECT p.lang, p.avail_chars, p.target_chars,
       least(p.target_chars, {_EPOCH_CAP} * p.avail_chars) AS granted_chars,
       CASE WHEN p.avail_chars = 0 THEN cast(-1 AS bigint)
            ELSE cast((least(p.target_chars,
                             {_EPOCH_CAP} * p.avail_chars)::HUGEINT
                       * 1000000) // p.avail_chars AS bigint)
       END AS epochs_x1e6,
       greatest(0, p.target_chars - {_EPOCH_CAP} * p.avail_chars)
         AS unmet_chars,
       coalesce(d.n_deadletter, 0) AS n_deadletter
FROM plan p LEFT JOIN dead d ON p.lang = d.lang
ORDER BY p.lang
""",
    doc="Dead-letter twin of pipe_data_epochs — the same data-"
    "constrained repetition plan (2x-corpus demand split by mixture "
    f"weight, grants capped at {_EPOCH_CAP} epochs of each language's "
    "actual mass), but zero/NULL-char documents are ROUTED through "
    "audit.dead_letter_rows (§2.9; reference drop-rows-never-runs, "
    "src/P6/__main__.py:258-268) into per-language n_deadletter "
    "counts instead of tripping the raising form's zero-mass guard. "
    "The literal weight table is the report spine, so an all-dirty "
    "language still appears with zero mass, its full demand as "
    "unmet_chars, and epochs_x1e6 = -1 sentinel. The 2x demand "
    "target is computed over CLEAN mass only. On a clean corpus "
    "equals the raising form + an all-zero n_deadletter column "
    "(tests/test_deadletter_r11.py). Scale shape identical: one scan "
    "splits clean/dead, one hash aggregate per side, broadcast 5-row "
    "arithmetic.",
    tags=("pipeline", "training", "mixture", "fixed-point", "audit"),
)
def pipe_data_epochs_deadletter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spine, dead_counts = _clean_dead_spine(spark, sf_dir)
    t = spine.agg(F.expr("2 * sum(avail_chars)").alias("total_target"))
    plan = spine.crossJoin(F.broadcast(t)).select(
        "lang",
        "avail_chars",
        F.expr(
            "cast((cast(total_target as decimal(38,0)) * w_x1e6)"
            " div 1000000 as bigint)"
        ).alias("target_chars"),
    )
    return (
        plan.join(F.broadcast(dead_counts), "lang", "left")
        .select(
            "lang",
            "avail_chars",
            "target_chars",
            F.expr(
                f"least(target_chars, {_EPOCH_CAP} * avail_chars)"
            ).alias("granted_chars"),
            F.when(F.col("avail_chars") == 0, F.lit(-1).cast("long"))
            .otherwise(
                F.expr(
                    f"cast((cast(least(target_chars, {_EPOCH_CAP}"
                    " * avail_chars) as decimal(38,0)) * 1000000)"
                    " div avail_chars as bigint)"
                )
            )
            .alias("epochs_x1e6"),
            F.expr(
                f"greatest(0, target_chars - {_EPOCH_CAP} * avail_chars)"
            ).alias("unmet_chars"),
            F.coalesce("n_deadletter", F.lit(0).cast("long")).alias(
                "n_deadletter"
            ),
        )
        .orderBy("lang")
    )

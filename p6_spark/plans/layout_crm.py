"""Physical-layout advice and CRM segmentation: column encoding
statistics (RLE/dict advisor), RFM customer quintile segments, and
order-key sequence-gap forensics — certified in the registry's exact
style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from p6_spark.plans.registry import register
from p6_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Column-encoding advisor (RLE / dictionary statistics)
# ---------------------------------------------------------------------------

_ENC_COLS = [
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_shipdate", "strftime(l_shipdate, '%Y-%m-%d')"),
]


# Run statistics are counted per WRITE BUCKET (2048 orderkeys ≈ one
# file's worth of rows): runs reset at bucket boundaries, exactly as
# RLE resets at file/row-group boundaries. This is what makes the plan
# scale-safe — the lag window partitions by bucket instead of funneling
# the whole table through one partition (the r4-flagged shape).
#
# Two caveats consumers of n_runs/avg_run_len must know (ADVICE r5):
# - OUTPUT-COMPATIBILITY BREAK at round 5: bucketing changed the
#   observable numbers, not just the plan — n_runs = n_buckets +
#   within-bucket changes, so r5+ values are NOT diffable against
#   rounds <= 4 (which counted runs over one global order).
# - The bucket keys on SPARSE l_orderkey values: TPC-H assigns ~1 in 4
#   orderkeys, so a 2048-orderkey bucket holds ~512 orders (~2k
#   lineitem rows), not 2048 orders. The approximation only shifts
#   where runs reset; a dense per-file row index would need the very
#   global ordering this plan exists to avoid.
_ENC_BUCKET = 2048


def _enc_sql_one(name: str, expr: str) -> str:
    return f"""
SELECT '{name}' AS col,
       cast(count(*) AS bigint) AS n_rows,
       cast(count(DISTINCT v) AS bigint) AS n_distinct,
       cast(count(DISTINCT bkt) + sum(CASE WHEN v <> pv THEN 1 ELSE 0 END)
            AS bigint) AS n_runs,
       cast(count(*) * 1000 //
            (count(DISTINCT bkt) + sum(CASE WHEN v <> pv THEN 1 ELSE 0 END))
            AS bigint) AS avg_run_len_x1e3
FROM (
  SELECT bkt, v,
         lag(v) OVER (PARTITION BY bkt ORDER BY l_orderkey, l_linenumber, v) AS pv
  FROM (SELECT l_orderkey, l_linenumber,
               l_orderkey // {_ENC_BUCKET} AS bkt, {expr} AS v
        FROM lineitem)
)"""


@register(
    "q_encoding_advisor",
    oracle="\nUNION ALL\n".join(_enc_sql_one(n, e) for n, e in _ENC_COLS)
    + "\nORDER BY col",
    doc="Column-encoding advisor: per column, cardinality (dictionary "
    "viability) and run statistics in the table's write order "
    "(orderkey, linenumber) WITHIN each 2048-orderkey write bucket — "
    "avg run length is what decides RLE vs dict vs plain, and runs "
    "reset at bucket boundaries exactly as RLE resets per "
    "file/row-group, so per-bucket counting is the semantically "
    "honest number AND the scale-safe plan: the lag window partitions "
    "by bucket (each partition a file's worth of rows), replacing the "
    "r4-flagged global-order single-partition window. n_runs = "
    "n_buckets + within-bucket value changes, identically in both "
    "engines.",
    tags=("layout", "stats", "window"),
)
def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = None
    specs = [
        ("l_returnflag", F.col("l_returnflag")),
        ("l_linestatus", F.col("l_linestatus")),
        ("l_shipdate", F.date_format("l_shipdate", "yyyy-MM-dd")),
    ]
    # (orderkey, linenumber) is NOT unique in lineitem, so the sort
    # alone is not total and run counts were tie-order-dependent (caught
    # by the sf1.0 sweep: n_runs off by 15). Appending v makes the run
    # count well-defined: any remaining ties carry identical v, which
    # adjacent-change counting is invariant to.
    w = W.partitionBy("bkt").orderBy("l_orderkey", "l_linenumber", "v")
    for name, col in specs:
        v = li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(f"l_orderkey div {_ENC_BUCKET}").alias("bkt"),
            col.alias("v"),
        )
        lagged = v.select("bkt", "v", F.lag("v").over(w).alias("pv"))
        row = lagged.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("v").alias("n_distinct"),
            (
                F.countDistinct("bkt")
                + F.sum(F.when(F.col("v") != F.col("pv"), 1).otherwise(0))
            ).alias("n_runs"),
        ).select(
            F.lit(name).alias("col"),
            "n_rows",
            "n_distinct",
            "n_runs",
            F.expr("cast(n_rows * 1000 div n_runs as bigint)").alias(
                "avg_run_len_x1e3"
            ),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("col")


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@register(
    "q_rfm_segments",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         cast(count(*) AS bigint) AS freq,
         cast(sum(cast(round(o_totalprice * 100, 0) AS bigint)) AS bigint) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score,
         monetary
  FROM per_cust
)
SELECT cast(r_score * 100 + f_score * 10 + m_score AS bigint) AS segment,
       cast(count(*) AS bigint) AS n_customers,
       cast(sum(monetary) AS bigint) AS total_cents
FROM scored
GROUP BY 1
ORDER BY n_customers DESC, segment
LIMIT 25
""",
    doc="RFM segmentation: per customer, recency (last order date), "
    "frequency, monetary total -> quintile scores with ntile(5) "
    "SEMANTICS over total orders (value, custkey) so every boundary is "
    "deterministic; segment = 100r+10f+m, top-25 segments by "
    "population — the CRM targeting table (555 = champions, 111 = "
    "lost). The r4-flagged global ntile windows are gone: each score "
    "is a distributed two-phase rank (operators/ranking) fed through "
    "the exact ntile bucket-size formula — bit-identical to the "
    "oracle's ntile(5), no single-partition stage. Cutpoint "
    "broadcasting could not reproduce ntile exactly here because the "
    "tiebreak key (custkey) makes boundaries composite values; the "
    "distributed rank preserves the oracle unchanged.",
    tags=("bi", "crm", "window", "fixed-point"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p6_spark.operators.ranking import ntile_from_rank, two_phase_rank

    orders = _t(spark, sf_dir, "orders")
    # The three ranks all consume the same per-customer aggregate; the
    # round-5 chained version re-executed the orders scan + groupBy once
    # per rank's internal min/max subtree (~5x, an 11.7x bench
    # regression). Cut the lineage ONCE, compute every bound + the
    # customer count in ONE aggregate, and feed precomputed bounds into
    # each rank; the ranks then run independently off the cached base
    # and join back on the customer key.
    r_expr = F.unix_date(F.col("last_order").cast("date"))
    base = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "monetary"
            ),
        )
        .localCheckpoint()
    )
    stats = base.agg(
        F.min(r_expr).alias("r_lo"),
        F.max(r_expr).alias("r_hi"),
        F.min("freq").alias("f_lo"),
        F.max("freq").alias("f_hi"),
        F.min("monetary").alias("m_lo"),
        F.max("monetary").alias("m_hi"),
        F.count(F.lit(1)).alias("n_cust"),
    ).localCheckpoint()

    def bnd(lo: str, hi: str) -> DataFrame:
        return stats.select(
            F.col(lo).alias("_tpr_lo"), F.col(hi).alias("_tpr_hi")
        )

    # non-strict monotone image suffices: equal days share a bucket
    rk_r = two_phase_rank(
        base,
        [F.asc("last_order"), F.asc("o_custkey")],
        r_expr,
        rn_name="rn_r",
        bounds=bnd("r_lo", "r_hi"),
    ).select("o_custkey", "rn_r")
    rk_f = two_phase_rank(
        base,
        [F.asc("freq"), F.asc("o_custkey")],
        F.col("freq"),
        rn_name="rn_f",
        bounds=bnd("f_lo", "f_hi"),
    ).select("o_custkey", "rn_f")
    rk_m = two_phase_rank(
        base,
        [F.asc("monetary"), F.asc("o_custkey")],
        F.col("monetary"),
        rn_name="rn_m",
        bounds=bnd("m_lo", "m_hi"),
    ).select("o_custkey", "rn_m")
    scored = (
        base.join(rk_r, "o_custkey")
        .join(rk_f, "o_custkey")
        .join(rk_m, "o_custkey")
        .crossJoin(F.broadcast(stats.select("n_cust")))
        .select(
            "monetary",
            ntile_from_rank(F.col("rn_r"), F.col("n_cust"), 5).alias("r_score"),
            ntile_from_rank(F.col("rn_f"), F.col("n_cust"), 5).alias("f_score"),
            ntile_from_rank(F.col("rn_m"), F.col("n_cust"), 5).alias("m_score"),
        )
    )
    return (
        scored.groupBy(
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            )
            .cast("long")
            .alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").alias("total_cents"),
        )
        .orderBy(F.desc("n_customers"), "segment")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Key-sequence gap forensics
# ---------------------------------------------------------------------------


_GAP_SEQUENCES = [
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("part.p_partkey", "part", "p_partkey"),
    ("events.event_id", "events", "event_id"),
]


def _gap_sql_one(name: str, tbl: str, key: str) -> str:
    return f"""
SELECT '{name}' AS seq,
       cast(count(*) AS bigint) AS n_keys,
       cast(min(k) AS bigint) AS k_min,
       cast(max(k) AS bigint) AS k_max,
       cast(max(k) - min(k) + 1 - count(*) AS bigint) AS n_missing,
       cast(sum(CASE WHEN nk - k > 1 THEN 1 ELSE 0 END) AS bigint) AS n_gaps,
       cast(coalesce(max(CASE WHEN nk - k > 1 THEN nk - k - 1 END), 0) AS bigint)
         AS max_gap_len
FROM (
  SELECT k, lead(k) OVER (ORDER BY k) AS nk
  FROM (SELECT DISTINCT {key} AS k FROM {tbl})
)"""


@register(
    "q_key_gaps",
    oracle="\nUNION ALL\n".join(_gap_sql_one(*s) for s in _GAP_SEQUENCES)
    + "\nORDER BY seq",
    doc="Key-sequence completeness audit over every sequential id in "
    "the schema (orderkey, partkey, event_id): span vs count, number "
    "of holes, and the largest hole, via one lead() window over each "
    "distinct key table — missing-extract detection for pipelines fed "
    "by sequential upstream ids (a large unexpected gap = a dropped "
    "batch; the audit row says where to re-pull). On complete data "
    "the audit proves completeness with zeros rather than silence — "
    "the calendar counterpart is q_missing_days. The r4-flagged "
    "global lead() window is gone: keys get a distributed two-phase "
    "rank (operators/ranking), and the successor key arrives by an "
    "ordinary rn = rn+1 equi-self-join — same (k, nk) pairs as the "
    "oracle's lead(k) OVER (ORDER BY k), one range shuffle + one hash "
    "shuffle, no single-partition stage.",
    tags=("forensics", "quality", "window"),
)
def q_key_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p6_spark.operators.ranking import two_phase_rank

    out = None
    for name, tbl, key in _GAP_SEQUENCES:
        k = _t(spark, sf_dir, tbl).select(F.col(key).alias("k")).distinct()
        ranked = two_phase_rank(k, [F.asc("k")], F.col("k"))
        nxt = ranked.select(
            (F.col("rn") - 1).alias("rn"), F.col("k").alias("nk")
        )
        led = ranked.join(nxt, "rn", "left").select("k", "nk")
        row = led.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            (F.max("k") - F.min("k") + 1 - F.count(F.lit(1))).alias("n_missing"),
            F.sum(
                F.when(F.col("nk") - F.col("k") > 1, 1).otherwise(0)
            ).alias("n_gaps"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("nk") - F.col("k") > 1, F.col("nk") - F.col("k") - 1
                    )
                ),
                F.lit(0),
            ).alias("max_gap_len"),
        ).select(
            F.lit(name).alias("seq"),
            "n_keys",
            "k_min",
            "k_max",
            "n_missing",
            "n_gaps",
            "max_gap_len",
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("seq")

"""Distributed total-order ranking — the scale-safe replacement for
global (unpartitioned) ``row_number()`` / running-sum / ``ntile``
windows.

A window with no PARTITION BY funnels the entire input through ONE
partition (Spark itself warns ``WindowExec: No Partition Defined``);
correct and fast at sf0.1, it is the textbook scale-killer at 100 TB.
The classical two-phase rewrite used here is arithmetic-identical:

1. Bucket every row by a DETERMINISTIC, order-monotone image of the
   leading sort key: ``bucket = floor((v - min) * B / span)`` with
   min/max from a broadcast 1-row aggregate. Monotone ⇒ bucket order
   equals sort order; deterministic ⇒ every re-execution of the
   subtree lands each row in the same bucket.
   (``repartitionByRange`` was rejected: its boundaries come from
   reservoir SAMPLING, and the prefix-offset subtree and the main
   stage execute that exchange independently — shuffle iteration
   order can drift between the two executions, move a boundary, and
   misalign offsets. Caught as an rn drift of ~tens at sf0.1 during
   certification of the chained-rank rewrite.)
2. Rank / running-sum WITHIN each bucket (``Window.partitionBy`` on
   the bucket — every window stays partition-local).
3. Per-bucket row counts and sums form a tiny (≤ ``buckets`` rows)
   summary; prefix offsets over it are computed with a triangular
   self-join (NOT a window — even a bounded one would reintroduce
   the banned single-partition WindowExec shape) and broadcast back;
   ``global = local + offset``.

Same integers as the global window, one ordinary hash shuffle, no
single-partition stage, no sampling. ``ntile_from_rank`` then
reproduces SQL ``ntile(k)`` bucket-size semantics (first ``n mod k``
tiles get one extra row) from the global rank — bit-identical to
DuckDB/Spark ``ntile`` over the same total order, so existing ntile
oracles certify unchanged.

Skew note: value-uniform buckets skew if the leading key is heavily
concentrated; ranking still distributes across the distinct leading
values (ties share a bucket but the in-bucket window is ordered by
the full total order). For a pathological constant key this
degenerates to one bucket — callers rank on keys with real spread
(values, dates, counts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def two_phase_rank(
    df: DataFrame,
    order: Sequence[Column],
    range_expr: Column,
    descending: bool = False,
    cum_cols: Sequence[str] = (),
    buckets: int = 64,
    rn_name: str = "rn",
    bounds: DataFrame | None = None,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Add a global 1-based ``row_number`` (``rn_name``) over the total
    order ``order`` — and, for each name in ``cum_cols``, a running sum
    ``cum_<name>`` inclusive of the current row — without any
    unpartitioned window.

    ``order`` must be a TOTAL order (unique composite key) and
    ``range_expr`` a NUMERIC, NON-NULL expression monotone in its
    leading sort key (e.g. the key itself, or ``F.unix_date(col)`` for
    dates), with ``descending`` matching the leading key's direction.
    A NULL ``range_expr`` raises at execution (``raise_error``) instead
    of silently dropping the row — a null bucket key would never
    satisfy the equi-join back to the broadcast offsets. Callers with
    nullable keys must coalesce explicitly and own the placement.
    All original columns are preserved.

    ``bounds``: optional precomputed 1-row DataFrame with columns
    ``_tpr_lo``/``_tpr_hi`` = min/max of ``range_expr`` over ``df``.
    When several ranks chain over the SAME (cached) base, computing all
    bounds in ONE aggregate and passing them here avoids re-executing
    the base lineage once per rank (the round-5 q_rfm_segments 11.7x
    regression). Wrong bounds give wrong ranks — they must be the true
    min/max.

    ``partition_cols``: optional grouping columns — the rank / running
    sums restart per group (SQL ``PARTITION BY g ORDER BY ...``), but
    the physical partitioning stays ``(bucket, g)``, so a LOW-cardinality
    group key (the classic 3-flag / per-tenant case, where a plain
    ``Window.partitionBy(g)`` funnels everything through |g| tasks)
    still spreads over all ``buckets`` x |g| tasks. The bucket bounds
    stay GLOBAL (one min/max, not per group): buckets are order-monotone
    within every group, which is all phases 2-3 need. The per-bucket
    summary grows to ``buckets`` x |g| rows and is broadcast — keep |g|
    small (<= thousands). Group keys must be NON-NULL, enforced with the
    same raise_error guard as ``range_expr``: the offset join back is a
    null-unsafe equi-join on the group key, so a NULL key would silently
    drop the row instead of ranking it (ADVICE r6) — coalesce nullable
    group keys explicitly and own the placement.
    """
    order = list(order)
    pcols = list(partition_cols)
    stats = (
        bounds.select("_tpr_lo", "_tpr_hi")
        if bounds is not None
        else df.agg(
            F.min(range_expr).alias("_tpr_lo"), F.max(range_expr).alias("_tpr_hi")
        )
    )
    v = (
        F.when(range_expr.isNotNull(), range_expr)
        .otherwise(
            F.raise_error(
                F.lit(
                    "two_phase_rank: range_expr is NULL — the bucket "
                    "equi-join would silently drop this row; coalesce "
                    "nulls explicitly before ranking"
                )
            )
        )
        .cast("double")
    )
    lo = F.col("_tpr_lo").cast("double")
    hi = F.col("_tpr_hi").cast("double")
    span = hi - lo + F.lit(1.0)
    raw = F.least(
        F.lit(buckets - 1),
        F.floor((v - lo) * F.lit(float(buckets)) / span).cast("int"),
    )
    bkt = (F.lit(buckets - 1) - raw) if descending else raw
    part = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_tpr_bkt", bkt)
        .drop("_tpr_lo", "_tpr_hi")
    )
    for g in pcols:
        # same loud-failure rule as range_expr: the offset equi-join on
        # the group key never matches NULL, which would silently drop
        # the row; value is unchanged when non-null
        part = part.withColumn(
            g,
            F.when(F.col(g).isNotNull(), F.col(g)).otherwise(
                F.raise_error(
                    F.lit(
                        f"two_phase_rank: partition_cols key '{g}' is NULL "
                        "— the offset equi-join would silently drop this "
                        "row; coalesce nulls explicitly before ranking"
                    )
                )
            ),
        )
    wloc = W.partitionBy("_tpr_bkt", *pcols).orderBy(*order)
    wrun = wloc.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = part.withColumn("_tpr_rn", F.row_number().over(wloc))
    for c in cum_cols:
        local = local.withColumn(f"_tpr_cum_{c}", F.sum(c).over(wrun))

    btot = local.groupBy("_tpr_bkt", *pcols).agg(
        F.count(F.lit(1)).alias("_tpr_cnt"),
        *[F.sum(c).alias(f"_tpr_tot_{c}") for c in cum_cols],
    )
    a = btot.alias("a")
    b = btot.alias("b")
    tri = F.col("b._tpr_bkt") < F.col("a._tpr_bkt")
    for g in pcols:
        tri = tri & (F.col(f"b.{g}") == F.col(f"a.{g}"))
    offs = (
        a.join(F.broadcast(b), tri, "left")
        .groupBy(
            F.col("a._tpr_bkt").alias("_tpr_bkt"),
            *[F.col(f"a.{g}").alias(g) for g in pcols],
        )
        .agg(
            F.coalesce(F.sum("b._tpr_cnt"), F.lit(0)).alias("_tpr_rn_off"),
            *[
                F.coalesce(F.sum(f"b._tpr_tot_{c}"), F.lit(0)).alias(
                    f"_tpr_off_{c}"
                )
                for c in cum_cols
            ],
        )
    )
    out = local.join(F.broadcast(offs), ["_tpr_bkt", *pcols]).withColumn(
        rn_name, (F.col("_tpr_rn") + F.col("_tpr_rn_off")).cast("long")
    )
    for c in cum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"_tpr_cum_{c}") + F.col(f"_tpr_off_{c}")
        )
    drop = ["_tpr_bkt", "_tpr_rn", "_tpr_rn_off"]
    drop += [f"_tpr_cum_{c}" for c in cum_cols]
    drop += [f"_tpr_off_{c}" for c in cum_cols]
    return out.drop(*drop)


def _idiv(a: Column, b: Column) -> Column:
    """Exact trunc-division of non-negative integral columns at ANY
    magnitude: ``(a - a % b)`` is an exact multiple of ``b``, and a
    decimal division whose true quotient is an integer representable in
    decimal(38,6) is exact — no double rounding anywhere (double
    true-division is only exact below ~2^53 and can round a quotient
    across an integer boundary above that)."""
    ad = a.cast("decimal(38,0)")
    bd = b.cast("decimal(38,0)")
    return ((ad - ad % bd) / bd).cast("long")


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` from a 1-based global rank ``rn`` and total row
    count ``n``: the first ``n mod k`` tiles hold ``n div k + 1`` rows,
    the rest ``n div k`` — the exact bucket-boundary rule both Spark and
    DuckDB implement, so scoring from a distributed rank matches an
    ``ntile`` oracle bit-for-bit, unconditionally: all divisions go
    through exact integer division (``_idiv``), never doubles. (When
    ``n < k`` every row is its own tile; the first branch always
    applies, so the q=0 division below is never evaluated.)"""
    q = _idiv(n, F.lit(k))
    rem = n % F.lit(k)
    big = rem * (q + 1)
    return (
        F.when(rn <= big, _idiv(rn - 1, q + 1) + 1)
        .otherwise(rem + _idiv(rn - big - 1, q) + 1)
        .cast("int")
    )

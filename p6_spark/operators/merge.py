"""MERGE INTO (upsert) semantics as a DataFrame composition.

Plain open-source Spark has no MERGE statement over parquet tables (that
is a table-format feature), but the relational semantics — update rows
matched by a source, keep unmatched target rows, insert source rows with
no target match — compose exactly from one full-outer join plus
per-column conditionals:

    WHEN MATCHED THEN UPDATE          -> both join sides present
    WHEN NOT MATCHED THEN INSERT      -> only the source side present
    (implicit) unmatched target rows  -> pass through unchanged

Scale notes: the join shuffles both sides on the merge key; with a
bucketed target (sources/sinks.write_bucketed) the target side is
exchange-free, and a small source (typical CDC batch) broadcasts, making
the merge map-side. One output row per target∪source key — the operator
never collects or loops on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    updates: dict[str, Column],
    inserts: dict[str, Column],
    status_col: str | None = None,
) -> DataFrame:
    """Return target MERGEd with source on ``key``.

    ``updates``/``inserts`` map target column name -> expression, built
    against aliases ``t`` (target) and ``s`` (source); omitted columns
    keep the target value on update and NULL on insert (the key itself
    always takes the source value on insert). ``status_col`` optionally
    appends 'updated' / 'inserted' / 'kept' for audit sinks.
    """
    t_key, s_key = F.col(f"t.{key}"), F.col(f"s.{key}")
    joined = target.alias("t").join(source.alias("s"), t_key == s_key, "full_outer")
    is_matched = t_key.isNotNull() & s_key.isNotNull()
    is_insert = t_key.isNull()
    out: list[Column] = []
    for c in target.columns:
        upd = updates.get(c, F.col(f"t.{c}"))
        ins = inserts.get(c, s_key if c == key else F.lit(None))
        out.append(
            F.when(is_matched, upd).when(is_insert, ins).otherwise(F.col(f"t.{c}")).alias(c)
        )
    if status_col is not None:
        out.append(
            F.when(is_matched, F.lit("updated"))
            .when(is_insert, F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias(status_col)
        )
    return joined.select(*out)

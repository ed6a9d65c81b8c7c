"""Skew mitigation: salted joins.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
plan-level tool for the cases AQE can't fix — e.g. a single hot key on
the build side of a shuffle join, or pre-AQE Spark. The pattern:

  left  rows get a deterministic pseudo-random salt in [0, S)
  right rows are replicated S times, once per salt value
  join on (key, salt) -> the hot key's rows spread over S partitions

Replication multiplies the right side by S, so salt the side whose
counterpart is small — or better, only replicate the right rows whose
keys are actually hot (pass `hot_keys`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join on `on` with the left side salted across `num_salts`
    shuffle partitions per key.

    The salt is derived from a hash of the left row's full content
    (xxhash64 over all columns) — deterministic, uniform, and needs no
    id column. If `hot_keys` is given, only those keys are salted and
    replicated; all other rows join with salt 0 and the right side is
    not multiplied for them.
    """
    lcols, rcols = left.columns, right.columns
    salt_hash = F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(num_salts))
    if hot_keys is None:
        l_salted = left.withColumn(SALT_COL, salt_hash)
        r_salted = right.withColumn(
            SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
        )
    else:
        is_hot = F.col(on).isin(hot_keys)
        l_salted = left.withColumn(
            SALT_COL, F.when(is_hot, salt_hash).otherwise(F.lit(0))
        )
        r_salted = right.withColumn(
            SALT_COL,
            F.explode(
                F.when(
                    is_hot, F.sequence(F.lit(0), F.lit(num_salts - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
    out = l_salted.join(r_salted, [on, SALT_COL], how).drop(SALT_COL)
    # preserve conventional column order: left cols then right's non-key cols
    return out.select(*lcols, *[c for c in rcols if c != on])

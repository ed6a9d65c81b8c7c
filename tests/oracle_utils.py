"""Local emulation of the driver's t2 correctness gate: run a registered
Spark query and its DuckDB oracle on the same parquet tables, then compare
row counts, schemas (column names), and exact values after sorting columns
by name and rows by value — the same canonicalization the driver hashes.
Exact equality (not approx) is the bar: the decimal-sum convention in the
query registry is what makes float aggregates bit-identical.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from p6_spark.sources.tables import HARNESS_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    # close() matters: every duckdb.connect() is its own database instance
    # with its own buffer pool, and an unclosed one keeps its buffers until
    # process exit — ~300 parity tests leaked enough to OOM a 128 GB box at
    # the END of a green full-suite run (the kill lands in teardown, after
    # [100%], so the tests all "passed" and only the exit code showed it).
    con = duckdb.connect()
    try:
        for t in HARNESS_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("int64")
        elif col.dtype == object:
            out[c] = col.map(_norm_obj)
    sort_key = out.astype(str)
    order = sort_key.sort_values(by=list(out.columns)).index
    return out.loc[order].reset_index(drop=True)


def _norm_obj(v):
    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return tuple(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return v


def _dtype_kind(dtype) -> str:
    # Collapse width but NOT numeric family: the driver hashes raw values, so
    # a DuckDB HUGEINT sum materialized as float64 (937.0) must NOT be allowed
    # to match Spark's int64 (937) here, or the local gate passes what the
    # driver's hash fails.
    k = np.dtype(dtype).kind if dtype != object else "O"
    return {"u": "i"}.get(k, k)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    shared = sorted(set(spark_pdf.columns) & set(oracle_pdf.columns))
    for c in shared:
        ka, kb = _dtype_kind(spark_pdf[c].dtype), _dtype_kind(oracle_pdf[c].dtype)
        if ka != kb:
            problems.append(
                f"dtype kind differs for column {c!r}: spark={spark_pdf[c].dtype}"
                f" oracle={oracle_pdf[c].dtype} (driver hash would mismatch)"
            )
    if problems:
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row counts differ: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.array_equal(av.to_numpy(), bv.to_numpy(), equal_nan=True)
            if not ok:
                diff = np.nanmax(np.abs(av.to_numpy() - bv.to_numpy()))
                problems.append(f"float column {c!r} differs (max abs diff {diff:.3e})")
        else:
            neq = ~(av.eq(bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"column {c!r} differs at row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                    f" ({int(neq.sum())} rows)"
                )
    return problems


def nan_to_none(x):
    return None if isinstance(x, float) and math.isnan(x) else x

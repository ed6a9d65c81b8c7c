#!/usr/bin/env python3
"""Distribution-matched synthetic testdata generator for scaling runs.

The harness testdata (``/root/testdata/sf*``, TESTDATA.md) is read-only
and stops at sf0.1, so the round-4 "scaling decade" evidence needs
locally generated data at sf1.0. This generator mirrors the harness
tables' schemas and value distributions (measured from sf0.01/sf0.1:
same key ranges, same categorical vocabularies, same uniform/exponential
shapes, same dup-planting in documents, unit-norm 64-dim embeddings) so
per-query growth ratios between a generated sf0.1 and a generated sf1.0
are apples-to-apples. It does NOT try to reproduce the harness RNG
stream — correctness at any SF is certified by the Spark-vs-DuckDB
oracle on the SAME files, which is provenance-independent.

Row-count scale model (measured):
  customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
  lineitem 6M*sf, events 1M*sf, documents 50k*sf,
  embeddings min(2000, max(500, 20k*sf)) (harness caps the quadratic
  brute-force-cosine table), event users = customer/10.

Usage: python scripts/gen_testdata.py SF OUTDIR [VOCAB]
  VOCAB: fixed30 (default, the harness's ~30-word vocabulary) or
  powerlaw (round-5 stretch: 5000-word Zipf(1.1) vocabulary — the
  realistic middle ground between the harness's degenerate 30-word
  corpus, which forced the LSH max_bucket caps, and a uniform
  high-entropy one where the caps never fire; used to certify that the
  caps neither over-prune nor under-bound on realistic skew).
  e.g. python scripts/gen_testdata.py 0.01 localdata/skew0.01 powerlaw
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00.000000")

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["small", "red", "blue", "hot", "cold", "large", "new", "old"]
NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "plate", "rod", "anvil"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = (
    "join hash row batch scan column customer filter small slow merge "
    "order vector line table data agg value key stream window a spark "
    "part group big sort query fast the"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.42, 0.145, 0.145, 0.145, 0.145]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _days_ts(rng, n, lo_day, hi_day) -> pa.Array:
    days = rng.integers(lo_day, hi_day + 1, n)
    return pa.array(
        (EPOCH_1995 + days.astype("timedelta64[D]")).astype("datetime64[us]")
    )


def generate(sf: float, out: str, vocab_mode: str = "fixed30") -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)
    n_cust = round(150_000 * sf)
    n_supp = round(10_000 * sf)
    n_part = round(200_000 * sf)
    n_ord = round(1_500_000 * sf)
    n_li = round(6_000_000 * sf)
    n_ev = round(1_000_000 * sf)
    n_doc = round(50_000 * sf)
    n_emb = min(2000, max(500, round(20_000 * sf)))
    n_users = max(1, n_cust // 10)

    _write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    _write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(0, 10000, n_supp), 2),
            }
        ),
    )
    pk = np.arange(n_part)
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "p_name": [
                    f"{ADJ[a]} {NOUN[b]}"
                    for a, b in zip(
                        rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                    )
                ],
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]
                ),
                "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": 900.0 + (pk % 1000) / 10.0,
            }
        ),
    )

    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _days_ts(rng, n_ord, 0, 2404),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _days_ts(rng, n_li, 1, 2498),
            }
        ),
    )

    span_us = 30 * 86_400 * 1_000_000
    ts_us = np.sort(rng.integers(0, span_us, n_ev))
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(
                    (EPOCH_2024 + ts_us.astype("timedelta64[us]")).astype(
                        "datetime64[us]"
                    )
                ),
                "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": np.maximum(
                    np.round(rng.exponential(50.0, n_ev), 2), 0.01
                ),
                "props": pa.array(
                    [
                        json.dumps({"k": int(k)})
                        for k in rng.integers(0, 100, n_ev)
                    ]
                ),
            }
        ),
    )

    lens = rng.integers(10, 100, n_doc)
    texts: list[str] = []
    if vocab_mode == "powerlaw":
        # Zipf(1.1) over a 5000-word vocabulary: realistic token skew
        # ("the"-class heads, long tail) instead of the harness's
        # 30-word degenerate corpus. Draw word INDICES by normalized
        # Zipf pmf so the distribution is exact and seed-stable.
        v_size = 5000
        ranks = np.arange(1, v_size + 1, dtype="float64")
        pmf = ranks ** -1.1
        pmf /= pmf.sum()
        vocab = np.array([f"w{i}" for i in range(v_size)])
        draw = lambda k: vocab[rng.choice(v_size, k, p=pmf)]  # noqa: E731
    else:
        vocab = np.array(DOC_VOCAB)
        draw = lambda k: vocab[rng.integers(0, len(vocab), k)]  # noqa: E731
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            # near-dup plant: copy an earlier doc, append the 'dup' marker
            texts.append(texts[rng.integers(0, i)] + " dup")
        else:
            texts.append(" ".join(draw(lens[i])))
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
                ),
                "source": [f"src{i % 20}" for i in range(n_doc)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    M = rng.normal(size=(n_emb, 64)).astype("float32")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(list(M), pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    vocab_mode = sys.argv[3] if len(sys.argv) > 3 else "fixed30"
    print(f"generating sf={sf} ({vocab_mode}) -> {out}")
    generate(sf, out, vocab_mode)

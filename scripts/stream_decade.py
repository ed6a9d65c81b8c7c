"""Streaming decade measurement (VERDICT r4 item 3): run the
watermarked event-stream suite against the sf1.0 events table split
into 150 time-ordered micro-batches (10x the r4 state-bound test's 15)
and record, per batch, input rows, processing throughput, and
stateOperators[0].numRowsTotal.

What it proves: over 10x more batches and 1000x more rows than the
pytest harness, the watermark keeps state FLAT (horizon-bounded, no
growth trend) while throughput stays steady — the stream would survive
an unbounded archive, which is the 100 TB streaming operating mode.

Usage:
  python scripts/stream_decade.py [--sf-dir localdata/sf1.0]
      [--chunks 150] [--out benchdata/r05_stream_decade_sf1.0.json]
Writes one JSON file with the per-batch curves + summary; the summary
table lives in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p6_spark.session import get_spark  # noqa: E402


def run_query(spark, name, stream_df):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(f"decade_{name}")
        .outputMode("append")
        .start()
    )
    t0 = time.perf_counter()
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    batches = [
        {
            "batch_id": p["batchId"],
            "input_rows": p.get("numInputRows", 0),
            "rows_per_sec": p.get("processedRowsPerSecond", 0.0),
            "state_rows": (p["stateOperators"][0]["numRowsTotal"] if p["stateOperators"] else None),
            "batch_ms": p.get("batchDuration"),
        }
        for p in prog
        if p.get("numInputRows", 0) > 0 or p["stateOperators"]
    ]
    return wall, batches


def summarize(batches, wall):
    st = [b["state_rows"] for b in batches if b["state_rows"] is not None]
    rows = sum(b["input_rows"] for b in batches)
    third = max(1, len(st) // 3)
    return {
        "n_batches": len(batches),
        "total_rows": rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec_overall": round(rows / wall, 1) if wall else None,
        "state_max": max(st) if st else None,
        "state_max_mid_third": max(st[third : 2 * third]) if st else None,
        "state_max_last_third": max(st[-third:]) if st else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="localdata/sf1.0")
    ap.add_argument("--chunks", type=int, default=150)
    ap.add_argument("--out", default="benchdata/r05_stream_decade_sf1.0.json")
    args = ap.parse_args()

    spark = get_spark("stream_decade")
    # keep every batch's progress (default ring buffer holds only 100)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(args.chunks * 3))

    from p6_spark.streaming.events import (
        read_chunked_stream,
        session_window_stats,
        tumbling_counts,
        write_time_chunks_distributed,
    )

    chunk_dir = tempfile.mkdtemp(prefix="stream_decade_")
    # distributed twin (r11): chunking sf1.0+ no longer funnels the
    # events table through driver pandas — executors write the ranges,
    # the driver only renames files and stamps mtimes
    write_time_chunks_distributed(spark, args.sf_dir, chunk_dir, args.chunks)

    out = {"sf_dir": args.sf_dir, "n_chunks": args.chunks, "queries": {}}
    for name, build in [
        ("tumbling_counts", tumbling_counts),
        ("session_window_stats", session_window_stats),
    ]:
        wall, batches = run_query(spark, name, build(read_chunked_stream(spark, chunk_dir)))
        out["queries"][name] = {"summary": summarize(batches, wall), "batches": batches}
        print(name, json.dumps(out["queries"][name]["summary"]))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    spark.stop()


if __name__ == "__main__":
    main()

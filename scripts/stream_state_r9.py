"""Round-9 streaming-state measurement: drive the two new streaming
twins (retrieval ledger, conformal coverage monitor) over many
micro-batches and record stateOperators numRowsTotal per batch.

What it proves: ledger state is bounded by the KEY universe
(|queries| rows for the retrieval ledger, |alphas| for the coverage
monitor), independent of how many result/score rows stream through —
the curves must go FLAT once every key has been seen, with input rows
still arriving. That is the 100 TB operating mode for monitoring-shaped
streams: state is the report, not the data.

Usage:
  python scripts/stream_state_r9.py [--sf-dir localdata/sf1.0]
      [--chunks 60] [--out benchdata/r09_stream_state.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p6_spark.session import get_spark  # noqa: E402


def drive(spark, name, stream_df, expected_triggers):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(f"state_{name}")
        .outputMode("complete")
        .start()
    )
    t0 = time.perf_counter()
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    # recentProgress is a ring buffer (spark.sql.streaming.
    # numRecentProgressUpdates, default ~100); main() raises it above the
    # chunk count, and this assert catches any silent truncation that
    # would otherwise compute the summary over an incomplete window.
    if len(prog) < expected_triggers:
        raise RuntimeError(
            f"{name}: progress history truncated — {len(prog)} events < "
            f"{expected_triggers} expected triggers; raise "
            "spark.sql.streaming.numRecentProgressUpdates above --chunks"
        )
    batches = [
        {
            "batch_id": p["batchId"],
            "input_rows": p.get("numInputRows", 0),
            "state_rows": (p.get("stateOperators") or [{}])[0].get(
                "numRowsTotal", 0
            ),
        }
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    return {"wall_s": round(wall, 2), "batches": batches}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="localdata/sf1.0")
    ap.add_argument("--chunks", type=int, default=60)
    ap.add_argument("--out", default="benchdata/r09_stream_state.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from p6_spark.plans.retrieval_r9 import _ranked_panel
    from p6_spark.plans.registry import _load_all, QUERIES
    from p6_spark.streaming.evals import (
        coverage_monitor_stream,
        retrieval_ledger_stream,
    )

    _load_all()
    spark = get_spark(
        "stream_state_r9", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    # keep the full per-batch state curve: the progress ring buffer must
    # hold every trigger (one per chunk file) or the summary is computed
    # over a truncated window (drive() asserts this held).
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(args.chunks + 64),
    )
    tmp = tempfile.mkdtemp(prefix="r9stream_")
    out: dict = {"_doc": __doc__.strip().splitlines()[0], "sf_dir": args.sf_dir}
    try:
        # 1) retrieval ledger: chunk the ranked panel into many files
        panel = _ranked_panel(spark, args.sf_dir)
        panel_dir = os.path.join(tmp, "ranked")
        panel.repartition(args.chunks).write.parquet(panel_dir)
        # one file per trigger so the state curve has many points
        stream = retrieval_ledger_stream(
            spark.readStream.schema("q long, rnk int, gain int")
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(panel_dir)
        )
        r = drive(spark, "ledger", stream, args.chunks)
        r["n_keys"] = panel.select("q").distinct().count()
        out["retrieval_ledger"] = r

        # 2) coverage monitor: thresholds from the batch query, scores chunked
        thr_rows = QUERIES["ml_conformal_threshold"].build(
            spark, args.sf_dir
        ).collect()
        thresholds = spark.createDataFrame(
            [
                (x["alpha_x100"], x["n_cal"], x["k"], x["threshold"])
                for x in thr_rows
            ],
            "alpha_x100 int, n_cal long, k long, threshold long",
        )
        from p6_spark.sources.tables import load_table

        li = load_table(spark, args.sf_dir, "lineitem")
        holdout = li.filter(F.col("l_orderkey") % 2 != 0).select(
            F.expr(
                "abs(cast(round(l_extendedprice * 100, 0) as bigint)"
                " - cast(l_quantity as bigint) * 100000)"
            ).alias("score")
        )
        scores_dir = os.path.join(tmp, "scores")
        holdout.repartition(args.chunks).write.parquet(scores_dir)
        mon = coverage_monitor_stream(
            spark.readStream.schema("score long")
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(scores_dir),
            thresholds,
        )
        r2 = drive(spark, "coverage", mon, args.chunks)
        r2["n_keys"] = len(thr_rows)
        out["coverage_monitor"] = r2

        for key in ("retrieval_ledger", "coverage_monitor"):
            b = out[key]["batches"]
            out[key]["summary"] = {
                "n_batches": len(b),
                "total_input_rows": sum(x["input_rows"] for x in b),
                "max_state_rows": max(x["state_rows"] for x in b),
                "final_state_rows": b[-1]["state_rows"] if b else 0,
                # the invariant that matters: state NEVER exceeds the key
                # universe, no matter how many rows stream through
                "state_bounded_by_keys": max(x["state_rows"] for x in b)
                <= out[key]["n_keys"],
            }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        for key in ("retrieval_ledger", "coverage_monitor"):
            print(key, out[key]["summary"])
        print(f"wrote {args.out}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

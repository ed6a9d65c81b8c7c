"""Round-11 decade measurements (the r10 evidence pattern):

1. dd_contamination's new shuffle-hash fallback (VERDICT r10 item 1):
   time BOTH join strategies at sf0.1 and sf1.0 (10x documents) on
   distribution-matched localdata — shows the guard degrades to a
   ~linear shuffle, not a cliff, exactly like dd_decontam_ngram13's
   r10 measurement.
2. The mixture-family dead-letter twins (VERDICT r10 item 3):
   raising form vs twin at both scales — the twin must track its
   raising form's cost (same scan/aggregate shape plus one cheap
   dead-side rollup).

Usage:
  python scripts/r11_decade.py [--runs 3]
      [--small localdata/sf0.1] [--big localdata/sf1.0]
      [--out benchdata/r11_decade.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p6_spark.session import get_spark  # noqa: E402

_TWINS = [
    "pipe_domain_mixture",
    "pipe_domain_mixture_deadletter",
    "pipe_data_epochs",
    "pipe_data_epochs_deadletter",
]


def _timed(spark, build, runs: int) -> float:
    build().collect()  # warm (codegen/AQE)
    best = float("inf")
    for _ in range(max(1, runs)):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        build().collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--small", default="localdata/sf0.1")
    ap.add_argument("--big", default="localdata/sf1.0")
    ap.add_argument("--out", default="benchdata/r11_decade.json")
    args = ap.parse_args()

    from p6_spark.plans import get_queries
    from p6_spark.plans.llm_ops import _contamination_plan

    spark = get_spark(
        "r11_decade", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()

    out: dict = {"_doc": __doc__.strip().splitlines()[0], "runs": args.runs}
    for label, sf_dir in (("small", args.small), ("big", args.big)):
        rec: dict = {"sf_dir": sf_dir}
        for strategy, force in (("broadcast", False), ("shuffle", True)):
            sec = _timed(
                spark,
                lambda: _contamination_plan(spark, sf_dir, force_shuffle=force),
                args.runs,
            )
            rec[f"contamination_{strategy}_sec"] = sec
            print(f"{label} contamination {strategy}: {sec}s", flush=True)
        for name in _TWINS:
            sec = _timed(spark, lambda: qs[name](spark, sf_dir), args.runs)
            rec[f"{name}_sec"] = sec
            print(f"{label} {name}: {sec}s", flush=True)
        out[label] = rec

    s, b = out["small"], out["big"]
    out["ratios_10x_docs"] = {
        "contamination_broadcast": round(
            b["contamination_broadcast_sec"] / s["contamination_broadcast_sec"], 2
        ),
        "contamination_shuffle": round(
            b["contamination_shuffle_sec"] / s["contamination_shuffle_sec"], 2
        ),
        "contamination_fallback_vs_broadcast_at_big": round(
            b["contamination_shuffle_sec"] / b["contamination_broadcast_sec"], 2
        ),
        **{
            n: round(b[f"{n}_sec"] / s[f"{n}_sec"], 2)
            for n in _TWINS
        },
        **{
            f"{n}_twin_vs_raising_at_big": round(
                b[f"{n}_deadletter_sec"] / b[f"{n}_sec"], 2
            )
            for n in ("pipe_domain_mixture", "pipe_data_epochs")
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ratios_10x_docs"]))


if __name__ == "__main__":
    main()

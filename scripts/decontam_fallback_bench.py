"""Round-10 decade measurement of dd_decontam_ngram13's shuffle-hash
fallback (VERDICT r9 #2): time BOTH join strategies at sf0.1 and sf1.0
(10x documents) on distribution-matched localdata, min-of-N serialized
runs, and record the growth ratios. What it shows: the fallback's cost
grows ~linearly with the corpus (it shuffles both shingle sides once)
while staying within a small constant of the broadcast plan at sizes
where both are feasible — so the auto-guard's degradation is safe, not
a cliff.

Usage:
  python scripts/decontam_fallback_bench.py [--runs 3]
      [--small localdata/sf0.1] [--big localdata/sf1.0]
      [--out benchdata/r10_decontam_fallback_decade.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p6_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--small", default="localdata/sf0.1")
    ap.add_argument("--big", default="localdata/sf1.0")
    ap.add_argument(
        "--out", default="benchdata/r10_decontam_fallback_decade.json"
    )
    args = ap.parse_args()

    from p6_spark.plans.rigor_r9 import _decontam_ngram13_plan

    spark = get_spark(
        "decontam_fallback",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"_doc": __doc__.strip().splitlines()[0], "runs": args.runs}
    for label, sf_dir in (("small", args.small), ("big", args.big)):
        out[label] = {"sf_dir": sf_dir}
        for strategy, force in (("broadcast", False), ("shuffle", True)):
            # warm once (codegen/AQE), then min-of-N timed
            _decontam_ngram13_plan(spark, sf_dir, force_shuffle=force).collect()
            best = float("inf")
            for _ in range(max(1, args.runs)):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _decontam_ngram13_plan(
                    spark, sf_dir, force_shuffle=force
                ).collect()
                best = min(best, time.perf_counter() - t0)
            out[label][strategy] = {"sec": round(best, 4), "rows": len(rows)}
    for strategy in ("broadcast", "shuffle"):
        out[f"{strategy}_decade_ratio"] = round(
            out["big"][strategy]["sec"] / out["small"][strategy]["sec"], 2
        )
    out["shuffle_vs_broadcast_at_big"] = round(
        out["big"]["shuffle"]["sec"] / out["big"]["broadcast"]["sec"], 2
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

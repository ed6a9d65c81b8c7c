"""Round-11 memory rehearsal for the surfaces this round changed: the
``dd_contamination`` broadcast-size guard (both join strategies — the
claim is the shuffle-hash fallback degrades the SHUFFLE, not executor
memory) and the round-10/11 dead-letter twins vs their raising forms
(the claim is a twin adds a dead-side rollup, not a memory stage).

Per-query per-stage peakExecutionMemory capture from the Spark status
REST API, the scripts/memory_profile_r10.py machinery reused verbatim:
peakExecutionMemory is the executor-side execution-memory high
watermark per stage (hash tables, sort buffers, joins) — the number
that decides whether a partition fits an executor at 100 TB.

Usage:
  python scripts/memory_profile_r11.py
      [--panels localdata/sf0.1,localdata/sf1.0]
      [--out benchdata/r11_memory_profile.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from memory_profile_r10 import _api, _stage_rows  # noqa: E402

from p6_spark.session import get_spark  # noqa: E402

# (label, builder-name-or-strategy) — contamination runs BOTH paths of
# the r11 guard; each twin runs next to its raising form so the
# peak-memory delta of the dead-letter posture is measured, not argued.
QUERIES = [
    "pipe_domain_mixture",
    "pipe_domain_mixture_deadletter",
    "pipe_data_epochs",
    "pipe_data_epochs_deadletter",
    "pipe_quality_budget_cut",
    "pipe_quality_budget_cut_deadletter",
    "pipe_percentile_prune",
    "pipe_percentile_prune_deadletter",
    "pipe_sequence_packing",
    "pipe_sequence_packing_deadletter",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--panels", default="localdata/sf0.1,localdata/sf1.0")
    ap.add_argument("--out", default="benchdata/r11_memory_profile.json")
    args = ap.parse_args()

    spark = get_spark(
        "memory_profile_r11",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl + "/api/v1"
    app_id = _api(base, "/applications")[0]["id"]

    from p6_spark.plans.llm_ops import _contamination_plan
    from p6_spark.plans.registry import QUERIES as REG, _load_all

    _load_all()

    builders = [
        (
            "dd_contamination[broadcast]",
            lambda spark, sf: _contamination_plan(spark, sf, force_shuffle=False),
        ),
        (
            "dd_contamination[shuffle_fallback]",
            lambda spark, sf: _contamination_plan(spark, sf, force_shuffle=True),
        ),
    ] + [(n, REG[n].build) for n in QUERIES]

    out: dict = {
        "_doc": __doc__.strip().splitlines()[0],
        "cpus": spark.sparkContext.defaultParallelism,
        "panels": {},
    }
    for sf_dir in args.panels.split(","):
        panel: dict = {"queries": {}}
        panel["n_documents"] = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        seen: set[int] = set(_stage_rows(base, app_id))
        for name, build in builders:
            t0 = time.perf_counter()
            build(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            time.sleep(0.5)  # status store updates async after job end
            stages = _stage_rows(base, app_id)
            mine = {k: v for k, v in stages.items() if k not in seen}
            seen = set(stages)
            panel["queries"][name] = {
                "wall_s": round(wall, 2),
                "n_stages": len(mine),
                "peak_execution_memory_bytes": max(
                    (s["peak_execution_memory"] for s in mine.values()),
                    default=0,
                ),
                "total_shuffle_write_bytes": sum(
                    s["shuffle_write_bytes"] for s in mine.values()
                ),
                "top_stages": sorted(
                    mine.values(), key=lambda s: -s["peak_execution_memory"]
                )[:2],
            }
        out["panels"][sf_dir] = panel

    small, big = (out["panels"][p] for p in args.panels.split(","))
    out["decade_peak_memory_ratio"] = {
        name: round(
            big["queries"][name]["peak_execution_memory_bytes"]
            / max(1, small["queries"][name]["peak_execution_memory_bytes"]),
            2,
        )
        for name, _ in builders
    }
    out["fallback_vs_broadcast_peak_at_big"] = round(
        big["queries"]["dd_contamination[shuffle_fallback]"][
            "peak_execution_memory_bytes"
        ]
        / max(
            1,
            big["queries"]["dd_contamination[broadcast]"][
                "peak_execution_memory_bytes"
            ],
        ),
        2,
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "decade_peak_memory_ratio": out["decade_peak_memory_ratio"],
        "fallback_vs_broadcast_peak_at_big":
            out["fallback_vs_broadcast_peak_at_big"],
    }))


if __name__ == "__main__":
    main()

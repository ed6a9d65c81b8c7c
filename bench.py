"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The headline set is FROZEN in BENCH_MANIFEST.json (round 4) so
BENCH_r*.json diffs stay superset-comparable across rounds — append new
queries there with a note, never remove or reorder.

``--all`` benches the ENTIRE registry (same min-of-3 + inter-query GC
protocol) and adds per-family subtotals — the regression net for the
~200 queries outside the headline set (VERDICT r3 item 2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from p6_spark.plans import get_queries  # noqa: E402
from p6_spark.session import get_spark  # noqa: E402

_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_MANIFEST.json")


def headline_names() -> list[str]:
    with open(_MANIFEST) as f:
        return json.load(f)["headline"]


def iterative_names() -> list[str]:
    """Second manifest section (appended round 5): the pagerank-class
    iterative queries. Timed in the same run and reported inside
    "queries" + an "iterative_total" field; the headline "value" stays
    the sum of the frozen headline set only, so BENCH_r*.json totals
    remain superset-comparable with rounds ≤4."""
    with open(_MANIFEST) as f:
        return json.load(f).get("iterative", [])


def r6_names() -> list[str]:
    """Third manifest section (appended round 6): the incremental-ingest
    + composed-ANN family. Same contract as "iterative": timed in the
    run, reported inside "queries" + an "r6_total" field; the frozen
    headline "value" is untouched."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r6", [])


def r7_names() -> list[str]:
    """Fourth manifest section (appended round 7): the recall family
    (multi-probe ANN + blocking-quality audit). Same appended-section
    contract: timed, reported in "queries" + "r7_total"."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r7", [])


def r9_names() -> list[str]:
    """Round-9 eval-rigor/budget additions (BENCH_MANIFEST 'r9'):
    timed, reported in "queries" + "r9_total"."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r9", [])


def r9b_names() -> list[str]:
    """Round-9 measurement-trust additions (BENCH_MANIFEST 'r9b'):
    timed, reported in "queries" + "r9b_total"."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r9b", [])


def r10_names() -> list[str]:
    """Round-10 productionization additions (BENCH_MANIFEST 'r10'):
    timed, reported in "queries" + "r10_total"."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r10", [])


def r11_names() -> list[str]:
    """Round-11 mixture dead-letter twins (BENCH_MANIFEST 'r11'):
    timed, reported in "queries" + "r11_total"."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r11", [])


def r8_names() -> list[str]:
    """Fifth manifest section (appended round 8): the curation family
    (shard balance, curriculum order, dataloader plan, mutual-kNN
    graph, threshold sweep, cross-shard dup audit). Same contract:
    timed, reported in "queries" + "r8_total"."""
    with open(_MANIFEST) as f:
        return json.load(f).get("r8", [])


# Bench-noise sentinel (VERDICT r10 item 6): BENCH_NOTES' discard-the-
# load-inflated-run judgment, as code. A fixed cheap calibration query
# is timed (same min-of-N + gc protocol) BEFORE and AFTER the measured
# pass; its cost is workload-independent, so a pre/post ratio beyond
# _SENTINEL_THRESHOLD means the box got noisy mid-run and the artifact
# flags itself "noisy": rerun on a quiet machine instead of trusting it.
_SENTINEL_QUERY = "q06_revenue_filter"  # one filter-aggregate, ~0.15 s at sf0.1
_SENTINEL_THRESHOLD = 1.2


def measure_sentinel(spark, qs, sf_dir: str, runs: int = 3) -> float:
    """Min-of-N timing of the fixed calibration query, gc-drained,
    after ONE untimed self-warm run. The self-warm matters for the
    PRE measurement in registry_sweep.py, which fires right after
    session creation: without it the first timed run pays codegen +
    parquet listing + JVM JIT (and, in back-to-back sweep queues, the
    previous JVM's ~30 s forced-shutdown burn), so the pre reads
    high and flags an idle box as noisy (observed 1.9-6.2x phantom
    drift on the first r11 panels; their green counts are unaffected)."""
    qs[_SENTINEL_QUERY](spark, sf_dir).collect()
    spark._jvm.System.gc()
    best = float("inf")
    for _ in range(max(1, runs)):
        t0 = time.perf_counter()
        qs[_SENTINEL_QUERY](spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def sentinel_samples_verdict(samples: list[float],
                             threshold: float = _SENTINEL_THRESHOLD) -> dict:
    """Drift verdict over equal-warmth checkpoint samples. Registry
    sweeps measure the sentinel DURING the run (at quartile
    checkpoints): a fresh-session pre-measurement is structurally
    ~2.5x colder than a post-sweep one (JVM-wide JIT warmth from 300+
    queries, measured r11 — q06 self-warmed standalone converges to
    ~0.27 s where the post-sweep session reads ~0.11 s), so pre/post
    there flags IDLE boxes as noisy. bench.py's full untimed warmup
    pass runs every query before its pre, which keeps the simpler
    pre/post design valid for bench artifacts. Pure, so testable."""
    ratio = max(samples) / max(min(samples), 1e-9)
    return {
        "query": _SENTINEL_QUERY,
        "samples_sec": [round(s, 4) for s in samples],
        "drift_ratio": round(ratio, 4),
        "noisy": ratio > threshold,
    }


def sentinel_verdict(pre_sec: float, post_sec: float,
                     threshold: float = _SENTINEL_THRESHOLD) -> dict:
    """Self-describing sentinel record: drift ratio (slower/faster,
    >= 1) and the noisy flag. Pure so the flagging logic is testable."""
    ratio = max(pre_sec, post_sec) / max(min(pre_sec, post_sec), 1e-9)
    return {
        "query": _SENTINEL_QUERY,
        "pre_sec": round(pre_sec, 4),
        "post_sec": round(post_sec, 4),
        "drift_ratio": round(ratio, 4),
        "noisy": ratio > threshold,
    }


def family_of(name: str) -> str:
    """Bench family = registry prefix (dd_/txt_/sim_/mm_/pipe_/er_/ml_/
    p6_/q*). Keeps the --all report readable at 262 queries."""
    for fam in ("dd_", "txt_", "sim_", "mm_", "pipe_", "er_", "ml_", "p6_"):
        if name.startswith(fam):
            return fam.rstrip("_")
    return "q"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--all",
        action="store_true",
        help="bench every registered query (per-family subtotals)",
    )
    ap.add_argument(
        "--runs", type=int, default=3, help="timed runs per query (min is kept)"
    )
    ap.add_argument(
        "--out",
        default=None,
        help="file to write the full JSON line to (default benchdata/bench_last.json)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("p6_spark_bench")
    qs = get_queries()
    head = [n for n in headline_names() if n in qs]
    iters = [n for n in iterative_names() if n in qs and n not in head]
    r6 = [n for n in r6_names() if n in qs and n not in head and n not in iters]
    r7 = [n for n in r7_names() if n in qs and n not in head + iters + r6]
    r8 = [n for n in r8_names() if n in qs and n not in head + iters + r6 + r7]
    r9 = [
        n for n in r9_names() if n in qs and n not in head + iters + r6 + r7 + r8
    ]
    r9b = [
        n
        for n in r9b_names()
        if n in qs and n not in head + iters + r6 + r7 + r8 + r9
    ]
    r10 = [
        n
        for n in r10_names()
        if n in qs and n not in head + iters + r6 + r7 + r8 + r9 + r9b
    ]
    r11 = [
        n
        for n in r11_names()
        if n in qs
        and n not in head + iters + r6 + r7 + r8 + r9 + r9b + r10
    ]
    names = (
        list(qs)
        if args.all
        else head + iters + r6 + r7 + r8 + r9 + r9b + r10 + r11
    )
    # Optional comma-separated subset for local iteration / regression
    # bisection (e.g. SPARK_GRAFT_BENCH_QUERIES=q01_pricing_summary,q06_...)
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
        head = [n for n in head if n in keep]
        iters = [n for n in iters if n in keep]
        r6 = [n for n in r6 if n in keep]
        r7 = [n for n in r7 if n in keep]
        r8 = [n for n in r8 if n in keep]
        r9 = [n for n in r9 if n in keep]
        r9b = [n for n in r9b if n in keep]
        r10 = [n for n in r10 if n in keep]
        r11 = [n for n in r11 if n in keep]

    # Warmup: run every query once (untimed) so JVM startup +
    # WholeStageCodegen (Janino) compilation isn't billed to the timed
    # runs — warming at the target SF makes the AQE-chosen physical
    # plans (and thus the generated code) identical to the timed pass.
    # Timed runs still pay full plan construction + optimization +
    # scheduling, as any fresh query would.
    for name in names:
        try:
            qs[name](spark, sf_dir).collect()
        except Exception:
            pass

    # Post-warmup quiesce: a full warmup pass (~112 headline+section
    # queries, ~320 with --all) leaves the JVM with trailing GC / JIT /
    # async block-cleanup churn that inflates the first timed queries
    # (r11 --all attempt 1: pre 0.44 s vs post 0.24 s; an r12 run with
    # the fixed 10 s sleep still started with a 1.05 s sentinel vs
    # 0.15 s steady-state and 3-10x inflated early queries). Round 12:
    # drain ADAPTIVELY — gc, then re-time the sentinel until two
    # consecutive samples agree within the noise threshold (or a hard
    # 90 s cap), so the timed pass starts from steady state regardless
    # of how much churn the warmup left. Timed methodology per query is
    # unchanged; this only moves the start line to a quiet JVM.
    spark._jvm.System.gc()
    time.sleep(10)
    if _SENTINEL_QUERY in qs:
        t_cap = time.monotonic() + 90
        prev = measure_sentinel(spark, qs, sf_dir, args.runs)
        while time.monotonic() < t_cap:
            spark._jvm.System.gc()
            time.sleep(5)
            cur = measure_sentinel(spark, qs, sf_dir, args.runs)
            if max(prev, cur) / max(min(prev, cur), 1e-9) <= _SENTINEL_THRESHOLD:
                break
            prev = cur

    # Sentinel pre-measurement (load canary — see measure_sentinel).
    # Round 12 (VERDICT r11 item 2): the pre/post-only design is
    # structurally blind to a mid-run disturbance that clears before the
    # post sample (the r11 driver run's ten-query window read a CLEAN
    # 1.0006 sentinel), so the timed loop below re-samples the sentinel
    # at quartile checkpoints — the registry_sweep.py design — giving
    # >= 5 equal-warmth samples per artifact. The per-query timed
    # protocol (untimed warmup, min-of-N, inter-query GC + block drain)
    # is byte-unchanged; the sentinel runs BETWEEN query timings.
    sentinel_samples: list[float] = []
    if _SENTINEL_QUERY in qs:
        sentinel_samples.append(measure_sentinel(spark, qs, sf_dir, args.runs))
    checkpoints = sorted({max(1, len(names) * k // 4) for k in (1, 2, 3)})

    # N timed runs per query, report the min — the standard steady-
    # state measurement (GC pauses and scheduler jitter inflate any
    # single run; the min is the query's actual cost). Round 2's bench
    # showed min-of-2 is not enough insurance when the machine is busy:
    # one GC pause per pair inflated every query ~2x. A driver-side
    # System.gc() between queries drains accumulated garbage so each
    # query starts from the same heap state.
    timings: dict[str, float] = {}
    for qi, name in enumerate(names, 1):
        spark._jvm.System.gc()
        best = float("inf")
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        # Free localCheckpoint blocks between queries — the same lesson
        # check_queries.py learned at r6: over a 281-query --all run the
        # accumulated blocks build storage-memory pressure that inflates
        # late checkpoint-heavy queries (q_graph_kcore measured 2.9x its
        # r6 time before this). Each query is billed its own
        # materializations (the timed runs above include them); it just
        # starts from a clean block store.
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass
        if sentinel_samples and qi in checkpoints:
            sentinel_samples.append(
                measure_sentinel(spark, qs, sf_dir, args.runs)
            )

    total = round(
        sum(timings.values())
        if args.all
        else sum(timings[n] for n in head),
        4,
    )
    out = {
        "metric": "all_queries_total" if args.all else "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if sentinel_samples:
        sentinel_samples.append(measure_sentinel(spark, qs, sf_dir, args.runs))
        out["sentinel"] = sentinel_samples_verdict(sentinel_samples)
    if not args.all and iters:
        out["iterative_total"] = round(sum(timings[n] for n in iters), 4)
    if not args.all and r6:
        out["r6_total"] = round(sum(timings[n] for n in r6), 4)
    if not args.all and r7:
        out["r7_total"] = round(sum(timings[n] for n in r7), 4)
    if not args.all and r8:
        out["r8_total"] = round(sum(timings[n] for n in r8), 4)
    if not args.all and r9:
        out["r9_total"] = round(sum(timings[n] for n in r9), 4)
    if not args.all and r9b:
        out["r9b_total"] = round(sum(timings[n] for n in r9b), 4)
    if not args.all and r10:
        out["r10_total"] = round(sum(timings[n] for n in r10), 4)
    if not args.all and r11:
        out["r11_total"] = round(sum(timings[n] for n in r11), 4)
    if args.all:
        fams: dict[str, float] = {}
        for n, t in timings.items():
            fams[family_of(n)] = round(fams.get(family_of(n), 0.0) + t, 4)
        out["families"] = dict(sorted(fams.items()))
    line = json.dumps(out)
    # Persist the FULL JSON to a file: the driver records only the tail
    # of stdout, which front-truncated BENCH_r06.json past parsing
    # (r6 verdict "what's missing" #2). The file is the lossless copy.
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchdata", "bench_last.json"
    )
    try:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"bench.py: could not write {out_path}: {e}", file=sys.stderr)
    # The stdout line must PARSE from the driver's capture, which keeps
    # only the last ~2000 bytes: a line longer than that arrives
    # front-truncated and BENCH_r06/r07.json recorded "parsed": null.
    # Print a line guaranteed to fit: per-query detail for the frozen
    # headline set only (3 decimals), appended manifest sections as
    # *_total fields, full detail in the file above (path included).
    # Degrade by dropping the queries dict entirely before ever
    # emitting an unparseable line.
    print(slim_stdout_line(out, timings, head, args.all, out_path))


def slim_stdout_line(
    out: dict, timings: dict, head: list, all_mode: bool, out_path: str,
    budget: int = 1900,
) -> str:
    """The ONE stdout JSON line, guaranteed under the driver's ~2000-byte
    tail capture. Round 12 (VERDICT r11 item 3): the r11 degrade ladder
    shed the `*_total` section fields to make room for the sentinel,
    which cost the driver round-over-round visibility of exactly the
    sections the optimizations targeted. Fix: the stdout line always
    carries the sentinel as its 2-field summary ({drift_ratio, noisy} —
    the full sample list lives in the detail file) and is serialized
    with compact separators, which fits the 60-query headline detail
    PLUS every section total in ~1800 bytes. The degrade ladder stays
    as a backstop for future growth: totals shed first, queries last."""
    slim = dict(out)
    slim["detail"] = out_path
    slim["queries"] = {
        n: round(t, 3) for n, t in timings.items() if all_mode or n in head
    }
    if all_mode:
        slim.pop("queries")  # 283-query detail never fits; file has it
    if "sentinel" in slim:
        s = slim["sentinel"]
        slim["sentinel"] = {"drift_ratio": s["drift_ratio"], "noisy": s["noisy"]}
    compact = {"separators": (",", ":")}
    slim_line = json.dumps(slim, **compact)
    if len(slim_line) > budget:
        for k in list(slim):
            if k.endswith("_total"):
                slim.pop(k)
        slim_line = json.dumps(slim, **compact)
    if len(slim_line) > budget:
        slim.pop("queries", None)
        slim_line = json.dumps(slim, **compact)
    return slim_line


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Emit the scaling-decade markdown table from two bench JSON lines.

Usage: python scripts/scaling_report.py small.json big.json [--factor 10]

Reads two bench.py outputs (same query set, different SFs), prints a
markdown table of per-query seconds and the big/small growth ratio,
sorted by ratio descending, flagging anything above --threshold
(default 15 — the "~linear for 10x data" bar from the round-3 verdict;
sub-second small-SF timings are mostly fixed overhead, so tiny
absolute times inflate ratios and are marked accordingly).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--threshold", type=float, default=15.0)
    args = ap.parse_args()

    with open(args.small) as f:
        small = json.loads([ln for ln in f if ln.strip().startswith("{")][-1])
    with open(args.big) as f:
        big = json.loads([ln for ln in f if ln.strip().startswith("{")][-1])

    rows = []
    for name, t_small in small["queries"].items():
        t_big = big["queries"].get(name)
        if t_big is None:
            continue
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows.append((name, t_small, t_big, ratio))
    rows.sort(key=lambda r: -r[3])

    print(f"| query | sf{small['sf']} s | sf{big['sf']} s | ratio | note |")
    print("|---|---|---|---|---|")
    n_flag = 0
    for name, ts, tb, r in rows:
        note = ""
        if r > args.threshold:
            if ts < 0.35:
                note = "sub-0.35s base: overhead-dominated ratio"
            else:
                note = f"**> {args.threshold:g}x — audit**"
                n_flag += 1
        print(f"| {name} | {ts:.3f} | {tb:.3f} | {r:.1f}x | {note} |")
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(
        f"| **total ({len(rows)} queries)** | **{tot_s:.2f}** | **{tot_b:.2f}**"
        f" | **{tot_b / tot_s:.1f}x** | {n_flag} flagged |"
    )


if __name__ == "__main__":
    main()

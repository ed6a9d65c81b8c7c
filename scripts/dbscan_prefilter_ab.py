"""VERDICT r8 item 6: measure whether a Hamming pre-screen on the
already-computed LSH sign signatures can cut ml_dbscan_clusters' exact
distance-evaluation volume WITHOUT touching recall.

The idea being tested: every LSH candidate pair already has 4 per-table
sign signatures computed; pairs at small L2 distance tend to agree on
most sign bits, so `total_hamming(a, b) <= H` might skip exact-distance
work for far pairs. But sign-bit agreement is PROBABILISTIC, not a
bound — a true eps-pair can disagree on any given hyperplane — so the
screen is only admissible if, empirically AND structurally, some H
preserves every eps-edge. This script measures the joint (hamming,
eps) distribution over all candidates at the given SF and reports:

- per-H: candidates skipped, eps-edges lost;
- H_min = smallest H losing zero eps-edges, and the work it would skip;
- an end-to-end timing A/B (production vs screened) only if H_min
  skips a meaningful fraction, else the measured "no".

Writes benchdata/r09_dbscan_prefilter_ab.json either way (the
q_graph_link_predict precedent: a measured 'no' is a committed
outcome).

Run serialized — no other Spark session alive (the r7 bench lesson).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "benchdata/r09_dbscan_prefilter_ab.json"


def main() -> int:
    from pyspark.sql import functions as F

    from p6_spark.plans.density_index import _DB_EPS2
    from p6_spark.plans.registry import QUERIES, _load_all
    from p6_spark.session import get_spark
    from p6_spark.operators.similarity import (
        adaptive_planes,
        lsh_candidate_vec_pairs,
        lsh_signature,
    )
    from p6_spark.sources.tables import load_table

    _load_all()
    spark = get_spark("dbscan_ab", cpus=8)
    emb = load_table(spark, SF, "embeddings")
    probe = emb.agg(
        F.count(F.lit(1)).alias("n"), F.first(F.size("embedding")).alias("d")
    ).first()
    n, dims = int(probe["n"]), int(probe["d"])
    width = min(48, max(8, (n - 1).bit_length() - 1))

    sigs = emb.select(
        "vec_id",
        *[
            lsh_signature("embedding", width, t, dims=dims).alias(f"s{t}")
            for t in range(4)
        ],
    ).localCheckpoint()
    qv = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long")
    )
    e = emb.select("vec_id", qv.alias("qv")).localCheckpoint()
    cand = lsh_candidate_vec_pairs(emb).localCheckpoint()

    sa = sigs.select(
        F.col("vec_id").alias("id_a"), *[F.col(f"s{t}").alias(f"a{t}") for t in range(4)]
    )
    sb = sigs.select(
        F.col("vec_id").alias("id_b"), *[F.col(f"s{t}").alias(f"b{t}") for t in range(4)]
    )
    va = e.select(F.col("vec_id").alias("id_a"), F.col("qv").alias("qa"))
    vb = e.select(F.col("vec_id").alias("id_b"), F.col("qv").alias("qb"))
    ham = sum(
        F.bit_count(F.col(f"a{t}").bitwiseXOR(F.col(f"b{t}"))) for t in range(4)
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    joint = (
        cand.join(sa, "id_a").join(sb, "id_b").join(va, "id_a").join(vb, "id_b")
        .select(ham.alias("h"), (d2 <= _DB_EPS2).cast("int").alias("eps"))
        .groupBy("h", "eps")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    hist = {}
    for r in joint:
        hist.setdefault(int(r["h"]), [0, 0])[int(r["eps"])] += int(r["c"])
    n_cand = sum(a + b for a, b in hist.values())
    n_eps = sum(b for _, b in hist.values())
    max_h = max(hist) if hist else 0
    table = []
    h_min = None
    for H in range(0, max_h + 1):
        skipped = sum(a + b for h, (a, b) in hist.items() if h > H)
        lost = sum(b for h, (_, b) in hist.items() if h > H)
        table.append({"H": H, "skipped": skipped, "eps_lost": lost})
        if lost == 0 and h_min is None:
            h_min = H
    skip_at_hmin = next(
        (t["skipped"] for t in table if t["H"] == h_min), 0
    ) if h_min is not None else 0

    out = {
        "_doc": "VERDICT r8 item 6 measurement: Hamming pre-screen on LSH "
        "signatures vs exact distance evaluation in ml_dbscan_clusters. "
        "H_min = smallest per-pair total-Hamming cut that loses ZERO "
        "eps-edges at this SF; 'skipped' = candidate pairs the screen "
        "would exempt from exact distance work.",
        "sf": SF,
        "n_vectors": n,
        "dims": dims,
        "planes_per_table": width,
        "n_candidates": n_cand,
        "n_eps_edges": n_eps,
        "h_min_zero_loss": h_min,
        "skipped_at_h_min": skip_at_hmin,
        "skip_fraction_at_h_min": round(skip_at_hmin / n_cand, 4) if n_cand else 0,
        "hamming_table": table,
    }

    # Timing A/B only if the zero-loss screen skips >= 20% of candidates —
    # below that the extra signature join costs more than the distance
    # math it saves (dims are small; the join is the expensive part).
    if h_min is not None and n_cand and skip_at_hmin / n_cand >= 0.20:
        q = QUERIES["ml_dbscan_clusters"]
        t0 = time.time()
        q.build(spark, SF).collect()
        out["baseline_sec"] = round(time.time() - t0, 2)
        out["note"] = "screen viable by volume; production change still "
        "requires an oracle twin for the screened candidate set"
    else:
        out["verdict"] = (
            "NO — committed measured outcome: the smallest Hamming cut "
            "that preserves every eps-edge skips too little exact-distance "
            "work to pay for the extra signature join (and any tighter cut "
            "LOSES true eps-edges, i.e. touches recall, which the repo's "
            "recall-floor discipline forbids). Keep the production plan."
        )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "hamming_table"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-11 same-session A/B for q_graph_link_predict: wedge self-join
(the shape shipped since r6, re-validated lazy in the r7 A/B) vs the
sorted-adjacency pair-explosion restructure (window degree cap +
collect_list + posexplode/slice — no join).

Box wall-time drifts on a minutes timescale (the r11 box-calibration
lesson), so process-level before/after numbers are unreliable; this
script alternates the two variants inside ONE session, K rounds each,
and reports per-variant minima plus per-round ratios. Run serialized —
no other Spark session alive.

Usage: python scripts/ab_link_predict_r11.py [SF_DIR] [K]
Writes benchdata/r11_link_predict_ab.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OUT = "benchdata/r11_link_predict_ab.json"


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from p6_spark.session import get_spark
    from p6_spark.sources.tables import load_table

    spark = get_spark("ab_link_predict", cpus=None)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    def old_plan():
        li = load_table(spark, SF, "lineitem")
        edges = li.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).distinct()
        deg = (
            edges.groupBy("p")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter((F.col("d") >= 2) & (F.col("d") <= 50))
        )
        a = edges.join(deg, "p")
        b = edges.select(F.col("p").alias("pb"), F.col("s").alias("s2"))
        scored = (
            a.join(b, (F.col("pb") == F.col("p")) & (F.col("s2") > F.col("s")))
            .groupBy(F.col("s").alias("s1"), "s2")
            .agg(
                F.count(F.lit(1)).alias("common_parts"),
                F.sum(F.expr("1000000 div d")).alias("ra_x1e6"),
            )
        )
        return scored.orderBy(
            F.desc("common_parts"), F.desc("ra_x1e6"), "s1", "s2"
        ).limit(20)

    def new_plan():
        li = load_table(spark, SF, "lineitem")
        edges = li.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).distinct()
        capped = edges.withColumn(
            "d", F.count(F.lit(1)).over(W.partitionBy("p"))
        ).filter((F.col("d") >= 2) & (F.col("d") <= 50))
        adj = (
            capped.groupBy("p")
            .agg(F.array_sort(F.collect_list("s")).alias("ss"))
            .select("ss", F.size("ss").alias("d"))
        )
        pairs = adj.select(
            F.posexplode("ss").alias("i", "s1"), "ss", "d"
        ).select(
            "s1",
            F.explode(F.expr("slice(ss, i + 2, size(ss))")).alias("s2"),
            "d",
        )
        scored = pairs.groupBy("s1", "s2").agg(
            F.count(F.lit(1)).alias("common_parts"),
            F.sum(F.expr("1000000 div d")).alias("ra_x1e6"),
        )
        return scored.orderBy(
            F.desc("common_parts"), F.desc("ra_x1e6"), "s1", "s2"
        ).limit(20)

    variants = {"old_wedge_join": old_plan, "new_pair_explode": new_plan}

    # results must be identical before timing means anything
    rows = {n: [tuple(r) for r in fn().collect()] for n, fn in variants.items()}
    vals = list(rows.values())
    assert vals[0] == vals[1], "variants disagree — A/B aborted"

    times: dict[str, list[float]] = {n: [] for n in variants}
    for rnd in range(K):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().collect()
            times[name].append(round(time.perf_counter() - t0, 3))
    out = {
        "sf": SF,
        "rounds": K,
        "times": times,
        "min": {n: min(t) for n, t in times.items()},
        "ratio_new_over_old": round(
            min(times["new_pair_explode"]) / min(times["old_wedge_join"]), 3
        ),
        "identical_rows": len(vals[0]),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-11 same-session A/B for q_market_basket: basket self-join vs
the sorted-adjacency pair-explosion restructure (the
q_graph_link_predict shape). Same alternating-in-one-session protocol
as scripts/ab_link_predict_r11.py (process-level numbers drift on this
box). Run serialized. Writes benchdata/r11_market_basket_ab.json.

Usage: python scripts/ab_market_basket_r11.py [SF_DIR] [K]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OUT = "benchdata/r11_market_basket_ab.json"


def main() -> int:
    from pyspark.sql import functions as F

    from p6_spark.session import get_spark
    from p6_spark.sources.tables import load_table

    spark = get_spark("ab_market_basket", cpus=None)
    spark.sparkContext.setLogLevel("ERROR")

    def tail(pairs, items):
        n_orders = items.agg(F.countDistinct("ok").alias("n"))
        item_n = items.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
        ia = item_n.select(F.col("pk").alias("item_a"), F.col("n_item").alias("n_a"))
        ib = item_n.select(F.col("pk").alias("item_b"), F.col("n_item").alias("n_b"))
        return (
            pairs.join(ia, "item_a")
            .join(ib, "item_b")
            .crossJoin(F.broadcast(n_orders))
            .select(
                "item_a",
                "item_b",
                "n_pair",
                "n_a",
                "n_b",
                F.expr(
                    "cast((cast(n_pair as decimal(38,0)) * n * 1000000)"
                    " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
                ).alias("lift_x1e6"),
            )
            .orderBy(F.desc("n_pair"), F.desc("lift_x1e6"), "item_a", "item_b")
            .limit(20)
        )

    def items_df():
        li = load_table(spark, SF, "lineitem")
        return li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()

    def old_plan():
        items = items_df()
        a = items.alias("a")
        b = items.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
            )
            .groupBy(F.col("a.pk").alias("item_a"), F.col("b.pk").alias("item_b"))
            .agg(F.count(F.lit(1)).alias("n_pair"))
        )
        return tail(pairs, items)

    def new_plan():
        items = items_df()
        baskets = items.groupBy("ok").agg(
            F.array_sort(F.collect_list("pk")).alias("ps")
        )
        pairs = (
            baskets.select(F.posexplode("ps").alias("i", "item_a"), "ps")
            .select(
                "item_a",
                F.explode(F.expr("slice(ps, i + 2, size(ps))")).alias("item_b"),
            )
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("n_pair"))
        )
        return tail(pairs, items)

    variants = {"old_self_join": old_plan, "new_pair_explode": new_plan}
    rows = {n: [tuple(r) for r in fn().collect()] for n, fn in variants.items()}
    vals = list(rows.values())
    assert vals[0] == vals[1], "variants disagree — A/B aborted"

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(K):
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
            min(times["new_pair_explode"]) / min(times["old_self_join"]), 3
        ),
        "identical_rows": len(vals[0]),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from p6_spark.plans import get_queries  # noqa: E402
from p6_spark.session import get_spark  # noqa: E402

# Representative headline set: scan-agg, selective filter, star join,
# outer join + double agg, window top-k, rollup, distinct, text + dedup +
# similarity operators. Keep under ~30 s total at sf0.1.
HEADLINE = [
    "q01_pricing_summary",
    "q06_revenue_filter",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q07_nation_volume",
    "q08_market_share",
    "q13_orders_per_customer",
    "q17_small_quantity",
    "q18_large_orders",
    "q_topk_orders_per_segment",
    "q_rollup_orders",
    "q_distinct_counts",
    "q_conditional_agg",
    "q_window_suite",
    "q_merge_upsert",
    "q_tumbling_events",
    "q_sliding_events",
    "q_sessionize",
    "q_asof_nearest",
    "q_mode_median",
    "q_recursive_cte",
    "q_variant_json",
    "dd_exact_stats",
    "dd_minhash_lsh_pairs",
    "dd_hash_split",
    "dd_contamination",
    "dd_segment_dedup",
    "txt_quality",
    "txt_repetition",
    "txt_tfidf",
    "txt_pii_scrub",
    "txt_packed_assignment",
    "txt_importance_dsir",
    "txt_lm_score",
    "q_funnel",
    "sim_cosine_topk",
    "sim_centroid_stats",
    "q11_important_values",
    "q20_dominant_suppliers",
    "q_graph_pagerank",
    "sim_gram_matrix",
    "q_kmv_distinct",
    # round-3 continuation: analytics / in-engine ML / retrieval
    "q_ohlc_bars",
    "q_zorder_layout",
    "ml_linreg",
    "ml_decision_stump",
    "q_gini_concentration",
    "dd_bloom_probe",
    "txt_inverted_index",
    "er_sorted_neighborhood",
    # round-3 continuation: retrieval / timeseries / feature / serving
    "txt_bm25",
    "q_twap",
    "q_ewma16",
    "ml_feature_importance",
    "q_continuous_agg",
    "q_rfm_segments",
    # closing batch: ordinal / risk / eval
    "ml_roc_auc",
    "q_max_drawdown",
    "q_welch_ttest",
    "q_theil_index",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("p6_spark_bench")
    qs = get_queries()
    names = [n for n in HEADLINE if n in qs]
    # Optional comma-separated subset for local iteration / regression
    # bisection (e.g. SPARK_GRAFT_BENCH_QUERIES=q01_pricing_summary,q06_...)
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]

    # Warmup: run every headline query once (untimed) so JVM startup +
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

    # Three timed runs per query, report the min — the standard steady-
    # state measurement (GC pauses and scheduler jitter inflate any
    # single run; the min is the query's actual cost). Round 2's bench
    # showed min-of-2 is not enough insurance when the machine is busy:
    # one GC pause per pair inflated every query ~2x. A driver-side
    # System.gc() between queries drains accumulated garbage so each
    # query starts from the same heap state.
    timings: dict[str, float] = {}
    for name in names:
        spark._jvm.System.gc()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Partition-invariance: the fixed-point/integer-exact queries claim
'hash-exact under ANY partitioning'. Prove it: run each under a very
different shuffle-partition count (and with AQE coalescing disabled so
the setting actually bites) and demand row-identical results. This is
the local stand-in for 'same answer on a 1000-executor cluster'."""

from __future__ import annotations

import pytest

from p6_spark.plans import QUERIES, get_queries

get_queries()

INVARIANT_QUERIES = [
    "q01_pricing_summary",      # two-stage fast_exact_sums
    "sim_centroid_stats",       # fixed-point centroids
    "sim_ivf_ann",              # fixed-point Lloyd + integer re-rank
    "q_graph_pagerank",         # fixed-point damping rounds
    "txt_lm_score",             # x1e6 log-prob sums
    "txt_token_entropy",        # x1e6 entropy sums
    "sim_gram_matrix",          # integer outer products
    "q_kmv_distinct",           # portable-hash sketch
    "dd_cc_clusters",           # min-label propagation
    # round-3 continuation fixed-point family
    "ml_linreg",                # decimal(38,0) Gramian combination
    "q_gini_concentration",     # HUGEINT rank formula
    "q_hhi_concentration",      # cross-multiplied squares
    "q_mannwhitney_u",          # doubled tie-averaged ranks
    "q_chisq_independence",     # cross-multiplied expectations
    "q_hll_registers",          # md5 registers + integer estimator
    "q_cusum_drift",            # scaled running deviation sums
    "ml_lift_deciles",          # ntile over a total order
    "q_ks_two_sample",          # two-phase distributed prefix sum
    "q_skyline_2d",             # window-maxima dominance
    "q_market_basket",          # cross-multiplied lift + total-order top-k
    "txt_vocab_coverage",       # rank/cumsum over the vocab table
    # er/graph/timeseries additions
    "q_graph_bfs",              # frontier BFS hop histogram
    "q_twap",                   # integer duration-weighted means
    "q_ewma16",                 # 16-tap integer FIR over per-user windows
    "dd_survivorship",          # window + rollup on the 16-byte fingerprint
    # later round-3 batches
    "q_hll_merge",              # register-merge == direct proof
    "ml_power_iteration",       # integer matvec rounds
    "txt_bm25",                 # rational BM25 + integer-ln idf
    "q_cuped_adjust",           # decimal Gramian + cross-multiplied means
    "q_equidepth_hist",         # cum-rank bucket boundaries
    "ml_mutual_info",           # integer-ln MI over the cell table
    "q_pareto_cut",             # two-phase value-ordered cumsum
    "q_graph_cheapest_path",    # bounded min-plus relax rounds
    "pipe_drop_funnel",         # per-source stage attrition counts
    "txt_novelty_curve",        # min-per-shingle first-seen join
    "q_growth_accounting",      # distinct (user,week) ledger
    # round-6 adaptive-LSH family
    "dd_semantic_dedup",        # capped-LSH pairs + min-label components
    "dd_embedding_neardup",     # adaptive-bucket candidates, integer cos
    # ordinal/risk closing batch
    "q_kendall_gamma",          # contingency-cell pair products
    "ml_roc_auc",               # tie-aware rank-sum AUC
    "q_bollinger_breach",       # squared-comparison band test
    "q_graph_link_predict",     # degree-capped wedge join + RA index
    "q_welch_ttest",            # staged trunc-div t^2
    "mm_audio_energy",          # Arrow frame-energy stage
    "q_interval_union",         # per-user sweep-line islands
    "dd_substring_spans",       # shingle-run maximal duplicate spans
    "q_theil_index",            # snapped-ln weighted entropy
    "ml_cohens_kappa",          # cross-multiplied 2x2 agreement
    "q_islands_daily",          # lag-diff islands over the calendar
    # round-4 scale-fix family (bucket caps / panels / re-staged div)
    "dd_levenshtein_pairs",     # sorted-neighborhood windowed Levenshtein
    "dd_simhash_pairs",         # capped byte-block Hamming pairs
    "q_graph_kcore",            # capped candidate graph, 3 peel rounds
    "q_graph_triangles",        # capped oriented triangle join
    "dd_lsh_tuning",            # fixed-panel band-config sweep
    "ml_linreg2_anova",         # re-staged dollars^2 quotients
    "q_encoding_advisor",       # total-ordered run counting
    "q_max_drawdown",           # demeaned equity-curve drawdown
    "sim_lsh_ann",              # precomputed-hyperplane signatures
    # round-4 closing batch
    "txt_bigram_lm",            # snapped-ln bigram LM sums
    "q_kmv_setops",             # KMV union/intersection estimators
    "dd_span_provenance",       # first-seen shingle provenance
    "q_window_funnel",          # staged conditional-min funnel depths
    # round-6 incremental/ANN session batch
    "dd_incremental_neardup",   # capped probe join + integer Jaccard
    "sim_ivfpq_search",         # fixed-point coarse + integer ADC LUT
    "sim_hybrid_rrf",           # rank-only fusion over total orders
    "sim_ranker_agreement",     # integer tau over tie-free ranks
    "sim_ivf_incremental",      # frozen-centroid assign + trunc-div means
    "ml_dbscan_clusters",       # min-label CC + min-component borders
    "dd_split_leakage",         # CC + Knuth-hash split aggregates
    "pipe_incremental_ingest",  # three-stage funnel counts
    # round-7 recall batch
    "sim_multiprobe_lsh",       # probe-ring buckets + 6-dp re-rank
    "dd_blocking_quality_audit",  # panel truth vs capped-LSH candidates
    "pipe_sequence_packing",    # two-phase cumsum window assignment
    "pipe_domain_mixture",      # water-filling integer rates
    # round-8 curation batch
    "pipe_shard_balance",       # serpentine deal over the two-phase rank
    "pipe_curriculum_order",    # seeded-hash epoch orders, tier ranges
    "pipe_dataloader_plan",     # 1-row drop-last arithmetic
    "sim_knn_graph",            # integer-cos mutual top-k degrees
    "dd_threshold_sweep",       # one-pass jaccard threshold curve
    "dd_cross_shard_dup_audit", # confirmed pairs x serpentine shards
    "ml_pass_at_k",             # exact binomial-ratio pass@k
    "ml_bt_strength",           # fixed-point Bradley-Terry MM steps
    "pipe_post_dedup_mixture",  # CC survivors x water-filling totals
    "ml_calibration_bins",      # x1e6 reliability table + weighted ECE
    "ml_brier_decomposition",   # x1e12 Murphy components
    # round-9 eval-rigor + budgeted-curation batch
    "ml_mcnemar_test",          # 2x2 paired counters + x1e6 chi2
    "ml_average_precision",     # two-phase rank + x1e6 precision sums
    "ml_macro_f1",              # confusion cells + x1e6 harmonic means
    "ml_winrate_wilson",        # exact-int inputs into IEEE sqrt bounds
    "pipe_quality_budget_cut",  # two-phase cumsum vs broadcast budget
    "pipe_data_epochs",         # decimal-staged 5-row epoch grants
    "dd_decontam_ngram13",      # broadcast 13-gram any-hit flags
    # round-9 measurement-trust batch
    "ml_ndcg_at_5",             # literal-weight DCG/IDCG, per-query windows
    "ml_mrr_recall",            # per-query ledger + x1e6 rollup
    "ml_fleiss_kappa",          # HUGEINT-staged agreement rationals
    "ml_auc_delong",            # two-phase placement prefix + stepwise vars
    "ml_bootstrap_ci",          # md5-derandomized Poisson replicas
    "dd_leakage_safe_split",    # component-hash split + leak audit
    "pipe_percentile_prune",    # per-lang tie-atomic quantile cut
    "ml_conformal_threshold",   # two-phase order statistic + coverage
    "ml_ips_offpolicy",         # x1e6 cell weights, broadcast totals
    "ml_design_effect",         # decimal ANOVA sums, mean-square divs
    "ml_isotonic_calibration",  # bounded-ledger minimax PAV
    "ml_mde_power",             # literal-z MDE from exact ANOVA variance
    "ml_tost_equivalence",      # two one-sided Welch z vs literal z_95
    # round-10 productionization twins
    "pipe_quality_budget_cut_deadletter",  # routed split + two-phase rank
    "pipe_percentile_prune_deadletter",    # routed split + per-lang walk
    "pipe_sequence_packing_deadletter",    # routed split + prefix offsets
    # round-11 mixture-family twins
    "pipe_domain_mixture_deadletter",      # routed split + weight spine
    "pipe_data_epochs_deadletter",         # routed split + weight spine
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_result_invariant_to_shuffle_partitioning(spark, sf_dir, name):
    conf = spark.conf
    orig_parts = conf.get("spark.sql.shuffle.partitions")
    orig_coalesce = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(QUERIES[name].build(spark, sf_dir))
        conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows(QUERIES[name].build(spark, sf_dir))
    finally:
        conf.set("spark.sql.shuffle.partitions", orig_parts)
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", orig_coalesce)
    assert a == b

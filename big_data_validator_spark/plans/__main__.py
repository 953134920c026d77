"""Dump audited physical plans for the headline queries to PLANS.md.

    python -m big_data_validator_spark.plans [sf_dir] [out_path]

For each selected query: the ``explain('formatted')`` plan plus the facts
the tests pin (pushed filters, read schema, broadcast/take-ordered flags,
shuffle count, codegen span count).  The checked-in PLANS.md is the audit
trail for the 100 TB design claims — regenerate after plan-affecting
changes.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from big_data_validator_spark.plans.inspect import (
    formatted_explain,
    plan_report,
)

# plan-interesting, deterministic-plan queries (pandas-UDF sketch paths
# and the streaming query are excluded: their plans are dominated by
# ArrowEvalPython nodes / sink scaffolding, audited in their own tests)
PLAN_QUERIES = [
    "validation_summary_lineitem",
    "scan_pushdown_projection",
    "agg_pricing_summary",
    "rule_referential_integrity",
    "agg_rollup_region_nation",
    "agg_cube_segment_status",
    "agg_salted_skew_counts",
    "agg_percentiles",
    "window_dedup_rank",
    "topk_order_values",
    "join_semi_returned_orders",
    "join_region_revenue",
    "join_asof_orders_events",
    "drift_psi_totalprice",
    "rule_outlier_zscore",
    "join_full_outer_reconcile",
    "events_sessionize",
    "text_profile",
    "text_chunk_windows",
    "pipeline_curate_corpus",
    "rule_domain_range",
    "scan_permissive_roundtrip",
    "dedup_exact_keep_first",
    "sim_bruteforce_topk",
    "pack_sequences_docs",
    "corpus_mixture_plan",
    # round-5 session additions
    "cdc_changeset_orders",
    "train_shuffle_shards",
    "rule_key_gaps",
    "quality_gopher_flags",
    "pii_redaction_scan",
    "contamination_probes",
    "agg_grouping_sets",
    "window_lag_delta",
    "layout_zorder_stats",
    "agg_hll_mergeable",
    "events_top_sequences",
    "agg_equidepth_histogram",
    "rule_candidate_keys",
    "drift_chi2_priority",
    "agg_correlation_matrix",
    "scan_unpivot_metrics",
    "scan_partition_pruned",
    "emb_centroid_by_label",
    "streaming_exactly_once_sink",
    "text_unigram_lm_score",
    "text_langid_confusion",
    "window_moving_avg_7d",
    "dim_scd2_user_state",
    # drift_text_kl is audited in tests/test_plans.py instead: its
    # registry entry materializes eagerly (pinned wordcount relation +
    # release), so the returned frame's plan is a LocalTableScan — the
    # single-scan shape lives in the query body and its test.
    "mining_frequent_pairs",
    "gen_synthetic_validated",
    # round-6 session additions (streaming_attribution_left is drained
    # through a memory sink like the other streaming entries — its
    # state/eviction properties are pinned in tests/test_streaming.py)
    "cdc_apply_changeset",
    "rule_profile_trend_anomaly",
    "text_bpe_encode",
    "ts_resample_ffill",
    "pipeline_bpe_pack",
    "profile_mutual_information",
    "corpus_mixture_quality",
    "events_anomaly_weekday",
    "profile_key_skew",
    "profile_join_cardinality",
    "sample_hash_split",
    "join_asof_nearest",
    "rule_order_totals_reconcile",
    # round-7 session additions (streaming_metrics_trend is a
    # foreachBatch drain — audited in tests/test_streaming.py;
    # emb_near_dup_pairs/_clusters run Arrow bucket kernels and
    # materialize eagerly — their candidate-join shape is pinned in
    # tests/test_similarity_multimodal.py and tests/test_text_dedup.py)
    "join_asof_forward",
    "layout_compaction_plan",
    "join_point_in_time",
    "rule_k_anonymity",
    "agg_incremental_totals",
    # round-8 session additions (link_part_entities moved to the
    # eager-materialization class in r8 — its entry now routes through
    # materialize_release to free the capped-bucket cache, so the
    # returned frame's plan is a LocalTableScan; the blocked-join shape
    # is pinned by tests/test_linkage.py + the capped_bucket_pairs plan
    # tests.  profile_fd_composite is lattice-controlled over an eager
    # localCheckpoint like profile_fd_discovery — same exclusion.)
    "agg_incremental_minmax",
    "agg_incremental_join_mv",
    # dedup_ssjoin_prefix is in the eager-materialization class (its
    # cached shingle-set relation is released via materialize_release);
    # the prefix-prune shape is pinned in tests/test_text_dedup.py.
    # ts_rollup_cascade joined the eager-materialization class in r8
    # (cached stored-rollup + dirty relations released via
    # materialize_release); its semi/anti pass-through shape is pinned
    # in tests/test_timeseries.py (poisoned-row pass-through test).
    "topk_pareto_frontier",
    "events_rolling_distinct",
    # round-9 session additions (agg_kll_mergeable,
    # dedup_semantic_clusters and graph_label_propagation are in the
    # eager-materialization class — pinned est/CDF, cluster-pair, and
    # symmetrized-edge caches released via materialize_release, so the
    # returned frames are LocalTableScans; their sketch-merge,
    # within-cluster-only, and per-round join+agg shapes are pinned in
    # tests/test_sketches.py, tests/test_semantic_dedup.py and
    # tests/test_graph.py)
    "cdc_schema_changeset",
    # (streaming_kll_quantiles is a foreachBatch drain; its repository
    # protocol and merge path are audited in tests/test_sketches.py.
    # agg_kll_rolling materializes eagerly — pinned est/CDF caches
    # released — with its shape pinned in tests/test_sketches.py.)
    # round-10: the collect-per-gram rewrite made the substring dedup
    # cache-free and lazy again, so its plan is auditable
    "dedup_shared_substrings",
    "cdc_scd2_history",
    # rule_outlier_mad is in the eager-materialization class (pinned
    # med/MAD caches released via materialize_release); its 3-pass
    # shape is pinned in tests/test_profile.py.
    # graph_pagerank_flow is in the eager-materialization class (its
    # cached edge relation is released via materialize_release, so the
    # returned frame is a LocalTableScan); the per-iteration join+agg
    # shape is pinned in tests/test_graph.py.
    # round-11: text_unigram_learn/encode, link_fs_em, and
    # ts_theilsen_trend are driver-loop entries like text_bpe_learn
    # (bounded collects feed a createDataFrame result =
    # LocalTableScan — nothing to audit); link_fs_classify
    # materializes eagerly through materialize_release.  Their
    # distributed stages (vocabulary Viterbi pass, pattern-count
    # aggregation, pair TakeOrdered median) are pinned in
    # tests/test_text_dedup.py, tests/test_linkage.py, and
    # tests/test_timeseries.py.
    # round-11 second/third wave:
    "events_markov_transitions",
    "rule_monotonic_orderdate",
    "events_survival_km",
    "agg_time_decayed_value",
    "rule_conversion_ztest",
    # events_attribution_removal joined the driver-loop class (the
    # bounded (src,dst) sufficient statistic collects and the value
    # iteration runs driver-side -> LocalTableScan result); its one
    # distributed pass is the same window+aggregate shape audited via
    # events_markov_transitions, and its semantics are pinned in
    # tests/test_events_analytics.py.
    "text_pmi_collocations",
    "sim_hybrid_rrf",
    # drift_wasserstein and drift_ks_totalprice now materialize
    # eagerly (materialize_release frees the pinned per-value counts
    # frame), so the returned frame is a LocalTableScan; the block-scan
    # shape and block-width invariance stay pinned in
    # tests/test_relational.py.  dedup_ngram_containment shares
    # dedup_ngram_jaccard's audited inverted-index plan;
    # streaming_markov_drift's per-batch plan is sink scaffolding
    # (audited end-to-end in tests/test_streaming.py).
    # round-12 additions.  quality_linear_score: the zero-shuffle
    # claim — the only Exchange must be the weight-vector broadcast
    # (also pinned in tests/test_curation.py).  curation_dsir_weights:
    # the two-aggregation shape over the pinned feature frame.
    # contamination_ngram_bloom collects the bitmap at plan-build time
    # (bounded by m, documented) and its survivor-join shape is
    # pytest-pinned equal to the exact path; link_golden_record and
    # sim_sq8_recall are in the eager-materialization /
    # driver-stat classes (CC labels / min-max stats collect), their
    # vote-window and dual-ranking shapes pinned in
    # tests/test_linkage.py and tests/test_similarity_multimodal.py.
    "quality_linear_score",
    "curation_dsir_weights",
    # round-13 additions: ts_changepoint_cusum is the lazy-plan one —
    # the one-data-shuffle daily agg + the calendar-bounded window
    # stack ending in TakeOrdered.  (quality_linear_train,
    # text_repetition_metrics and dedup_excise_spans materialize
    # eagerly through materialize_release — LocalTableScan returns;
    # their line/gram-bounded shapes are pytest-pinned and share the
    # positioned-gram Generate audited on the contamination screens.
    # drift_cvm joins drift_wasserstein/drift_mannwhitney in the
    # eager-materialization class — same released per-value counts
    # frame, same block-scan shape pinned by block-width invariance in
    # tests/test_relational.py.  ts_binseg_changepoints is eager too
    # (pinned per-day agg released on materialize); its one-shuffle +
    # segment-window shape is the audited ts_changepoint_cusum plan
    # applied per level, pinned in tests/test_timeseries.py.)
    "ts_changepoint_cusum",
    # ts_acf_daily is lazy like the cusum entry (no pinned cache):
    # the one-shuffle daily agg + lead window + stack Generate +
    # per-lag aggregate.
    "ts_acf_daily",
    # round-13 fourth/fifth-wave lazy entries: the Pettitt rank
    # changepoint (daily agg + rank/prefix windows + TakeOrdered),
    # the runs test (daily agg + lag windows + one global agg), the
    # cross-correlation (two daily aggs + date join + lead window +
    # stack + per-lag agg), and the HHI (broadcast dim join + two
    # hash aggs + the un-prunable raise_error share guard).
    # (agg_spearman_rank, agg_kendall_tau and
    # agg_gini_customer_revenue materialize eagerly through
    # materialize_release — their one-data-shuffle pair-count /
    # per-value-count shapes are pinned by block-width invariance and
    # brute-force parity in tests/test_profile.py.)
    "ts_pettitt_changepoint",
    "ts_runs_test",
    "ts_xcorr_daily",
    "agg_hhi_supplier_nation",
    # round-13 fifth/sixth waves: the Cramér's V matrix is the lazy
    # one (one contingency shuffle per pair, broadcast marginal joins
    # on the cell frames, three-arm union).  The one-vs-rest segment
    # scans (drift_mannwhitney_by_segment, drift_segment_bh_scan) and
    # ts_mann_kendall materialize eagerly through materialize_release
    # — their one-data-shuffle pair-count / daily-frame shapes are
    # pinned by block-width invariance and brute-force parity in
    # tests/test_relational.py and tests/test_timeseries.py.
    "agg_cramers_v_matrix",
    # round-13 seventh/eighth waves, both lazy: the OLS moments scan
    # (one data shuffle + calendar-bounded index window + tiny moments
    # agg) and the McNemar conditional aggregation (one scan, no
    # shuffle beyond the single-row reduce).
    "ts_ols_trend",
    "rule_mcnemar_disagreement",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"

    from big_data_validator_spark.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bdv-plan-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sections = [
        "# PLANS — audited physical plans for headline queries\n",
        f"Generated by `python -m big_data_validator_spark.plans {sf_dir}`.\n"
        "Facts below are the same ones `tests/test_plans.py` pins; the\n"
        "formatted plan shows pushdown (`PushedFilters`), pruning\n"
        "(`ReadSchema`), join strategies, and WholeStageCodegen spans.\n",
    ]
    for name in PLAN_QUERIES:
        df = REGISTRY[name].fn(spark, sf_dir)
        rep = plan_report(df)
        facts = "\n".join(f"- **{k}**: {v}" for k, v in rep.items())
        sections.append(
            f"## {name}\n\n{facts}\n\n```\n{formatted_explain(df).strip()}\n```\n"
        )
    with open(out_path, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {out_path} ({len(PLAN_QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()

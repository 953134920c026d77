"""sf1.0 spot bench (VERDICT r6 item 5): the 10 most expensive BENCH_DETAIL
queries, run at the synthetic sf1.0 (/tmp/bdv_sf1, 10x key-shifted sf0.1)
on local[32] with bench.py's methodology (untimed warm pass, median of 3).
Writes BENCH_SCALE.json at the repo root.
"""
import json, os, statistics, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

SF_DIR = "/tmp/bdv_sf1"
# VERDICT r8 item 7: the 25 most expensive BENCH_DETAIL queries (the
# set whose sf0.1 costs dominate the headline — dedup/ANN/streaming/
# profile families), plus the earlier capability seats
# (join_point_in_time's one-shuffle as-of claim) and the round-9
# entries whose scale story IS the claim: the KLL monitor's map-side
# sketch pass, SemDeDup's within-cluster-only candidate discipline,
# and label propagation's per-round join+agg.
TOP = [
    "graph_pagerank_flow",
    "streaming_attribution_left",
    "dedup_ssjoin_prefix",
    "sim_ann_recall",
    "streaming_drift_psi",
    "dedup_winnowing",
    "dedup_minhash_clusters",
    "streaming_metrics_trend",
    "dedup_simhash",
    "agg_approx_distinct",
    "link_part_entities",
    "rule_order_totals_reconcile",
    "streaming_sessionize_stateful",
    "rule_profile_trend_anomaly",
    "dedup_minhash_lsh",
    "streaming_incremental_mv",
    "emb_near_dup_clusters",
    "ts_rollup_cascade",
    "streaming_attribution_join",
    "mining_frequent_pairs",
    "profile_orders_columns",
    "profile_fd_composite",
    "rule_outlier_mad",
    "text_bpe_learn",
    "emb_near_dup_pairs",
    "join_point_in_time",
    "agg_kll_mergeable",
    "graph_label_propagation",
    # round-10 scale proofs (VERDICT r9 items 2-5): the auto-k SemDeDup
    # and brand-blocked linkage configurations exist to be sublinear
    # here; the per-group KLL monitor and the single-exchange substring
    # dedup carry the round's other scale claims.
    "dedup_semantic_autok",
    "agg_kll_by_segment",
    "dedup_shared_substrings",
    "dedup_semantic_twolevel",
    "multimodal_phash_neardup",
    "cdc_scd2_history",
    "streaming_kll_by_group",
    "streaming_scd2_history",
    # round-11: the unigram-LM trainer's vocabulary-bounded EM claim,
    # the fingerprint-keyed substring exchange rewrite (in TOP above),
    # and the FS-linkage pair (pattern-count-bounded EM + map-side
    # posterior stamp)
    "text_unigram_learn",
    "link_fs_em",
    "link_fs_classify",
    # round-11 second wave: the exact-integer Wasserstein drift (same
    # block-scan scaling claim as KS) and the hybrid RRF retrieval
    # entry (corpus streamed once per signal, postings-bounded lexical
    # candidates — the claim worth measuring at 10x)
    "drift_wasserstein",
    "sim_hybrid_rrf",
    # round-11 third wave: the per-segment W1 (embarrassingly parallel
    # across segments — the claim worth measuring), the Matryoshka
    # prefix audit (one corpus pass for all prefixes), the Markov
    # attribution (events pass + data-independent iteration joins),
    # and the streaming TV monitor (micro-batch harness floor)
    "drift_wasserstein_by_year",
    "sim_matryoshka_recall",
    "events_attribution_removal",
    "streaming_markov_drift",
    # round-12 (VERDICT r11 item 4): the remaining r11 third wave —
    # contamination FIRST (the most expensive sf0.1 query at 11 s: its
    # 13-gram explode volume is the thing to measure at 10x), the
    # survival/trend/collocation/encode entries, and the containment
    # dedup's inverted-index claim
    "contamination_ngram_overlap",
    "events_survival_km",
    "ts_theilsen_trend",
    "text_pmi_collocations",
    "text_unigram_encode",
    "dedup_ngram_containment",
    "events_markov_transitions",
    "agg_time_decayed_value",
    # round-12 additions: the Bloom prefilter's survivor-volume claim,
    # the zero-shuffle classifier, DSIR's bounded count frame, the SQ8
    # one-pass dual ranking, and survivorship's shrunken vote frame
    "contamination_ngram_bloom",
    "quality_linear_score",
    "curation_dsir_weights",
    "sim_sq8_recall",
    "link_golden_record",
    # round-12 second wave: the rank-drift block scan and SNM's
    # bucket-join neighbor claim
    "drift_mannwhitney",
    "link_sorted_neighborhood",
    # round-12 third wave: the counts-frame winsorized cuts and the
    # k-1 scan-only passes of the coverage selector (both added after
    # the r12 scale run — their first sf1.0 exposure is round 13,
    # VERDICT r12 item 2)
    "agg_winsorized_stats",
    "sim_kcenter_coreset",
    # round-13: the integer-GD trainer's bounded per-step aggregations,
    # the closed train->serve loop, the span-excision transform's
    # token-bounded shuffles, the Gopher repetition suite's
    # line/gram-bounded legs, and the CUSUM daily-frame windows
    "quality_linear_train",
    "pipeline_quality_train_score",
    "dedup_excise_spans",
    "text_repetition_metrics",
    "ts_changepoint_cusum",
    # round-13 third wave: the CvM block scan (same claim as the
    # KS/W1/U siblings) and the binseg recursion's calendar-bounded
    # per-level windows over ONE pinned daily agg
    "drift_cvm",
    "ts_binseg_changepoints",
    "ts_acf_daily",
    # round-13 fourth/fifth waves: the rank-changepoint and runs-test
    # daily-frame windows, the two-feed cross-correlation join, the
    # pair-count association statistics (Spearman/Kendall — the
    # Σk² contingency self-join claim), and the concentration
    # profilers (Gini's block-prefix rank windows, HHI's broadcast
    # dim join + two hash aggs)
    "ts_pettitt_changepoint",
    "ts_runs_test",
    "ts_xcorr_daily",
    "agg_spearman_rank",
    "agg_kendall_tau",
    "agg_gini_customer_revenue",
    "agg_hhi_supplier_nation",
    # round-13 fifth wave: the shared-pool one-vs-rest rank scan (one
    # pair-count shuffle for ALL segments) and the Mann-Kendall daily
    # sign self-join (calendar-bounded, corpus-size-independent)
    "drift_mannwhitney_by_segment",
    "ts_mann_kendall",
    # round-13 sixth/seventh waves (landed after this round's full
    # dual-scale run; measured via the supplementary ONLY merge): the
    # Cramér's V one-scan-per-pair claim, the BH scan (same shared-pool
    # shape as drift_mannwhitney_by_segment plus |G|-row windows), and
    # the OLS moments scan (one shuffle, no joins)
    "agg_cramers_v_matrix",
    "drift_segment_bh_scan",
    "ts_ols_trend",
    # round-13 eighth/ninth waves (supplementary ONLY merges): the
    # McNemar single-conditional-agg scan and the streaming U monitor
    # (micro-batch harness + bounded counts frames — the ~1x class)
    "rule_mcnemar_disagreement",
    "streaming_mannwhitney_drift",
]

#: Deliberately NOT in the scale headline, with the reason shipped in
#: the JSON (VERDICT r10 item 4 — an intentional superlinear reads as
#: a regression when it sits in the headline).
EXCLUDED = {
    "dedup_semantic_clusters": (
        "fixed-k=8 SemDeDup demo: superlinear BY DESIGN (k pinned at 8 "
        "means within-cluster candidate pairs grow ~100x for 10x data; "
        "measured 27.9x in r10, kept as the contrast case).  The "
        "shipped scale paths are dedup_semantic_autok (k = ceil(n/50)) "
        "and dedup_semantic_twolevel (IVF two-hop assignment), both in "
        "TOP; the fixed-k determinism contract stays pytest-pinned "
        "(tests/test_semantic_dedup.py)."
    ),
}

spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "96g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.shuffle.partitions", "32").getOrCreate())
spark.range(1000).select(F.sum("id")).collect()
from pyspark.sql.pandas.functions import pandas_udf

@pandas_udf("long")
def _warm(v):
    return v

spark.range(1000).repartition(32).select(_warm("id")).write.mode(
    "overwrite").format("noop").save()

from big_data_validator_spark.queries import all_queries
registry = all_queries()
# SAME-SESSION sf0.1 reference (round 8): ratios computed against a
# committed BENCH_DETAIL.json from another session mix host-load noise
# into the scale claim — the r8 rerun showed the same query moving 2x
# between sessions while the within-session ratio held.  Both scales
# run interleaved in one session so numerator and denominator see the
# same host.
REF_DIR = os.environ.get("SPARK_GRAFT_SCALE_REF", "/root/testdata/sf0.1")
#: Supplementary mode (SPARK_GRAFT_SCALE_ONLY="a,b,c"): measure only the
#: named TOP entries — the late-wave case where a few entries land after
#: the round's full dual-scale run — and MERGE their rows into the
#: existing BENCH_SCALE.json instead of overwriting the whole record.
#: Each entry's sf0.1 reference is still timed in the SAME session, so
#: its ratio keeps the methodology; the merge is recorded in the note.
ONLY = [
    n for n in os.environ.get("SPARK_GRAFT_SCALE_ONLY", "").split(",") if n
]
if ONLY:
    unknown = [n for n in ONLY if n not in TOP]
    if unknown:
        raise SystemExit(f"SPARK_GRAFT_SCALE_ONLY not in TOP: {unknown}")
    TOP = ONLY
samples = {n: [] for n in TOP}
ref_samples = {n: [] for n in TOP}
for timed in [False, True, True, True]:
    for name in TOP:
        for sf_dir, sink in ((REF_DIR, ref_samples), (SF_DIR, samples)):
            start = time.perf_counter()
            df = registry[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - start
            if timed:
                sink[name].append(dt)
            label = "timed" if timed else "warm "
            print(f"{label} [{sf_dir}] {name}: {dt:.2f}s", flush=True)

timings = {n: round(statistics.median(v), 3) for n, v in samples.items()}
ref_timings = {
    n: round(statistics.median(v), 3) for n, v in ref_samples.items()
}
ratios = {
    n: round(timings[n] / ref_timings[n], 2) if ref_timings[n] else None
    for n in TOP
}
out = {
    "metric": "sf1_spot_bench_sec",
    "value": round(sum(timings.values()), 3),
    "unit": "sec",
    "queries": timings,
    "queries_min": {n: round(min(v), 3) for n, v in samples.items()},
    "queries_sf01_same_session": ref_timings,
    "ratio_vs_sf01": ratios,
    # max/min over the 3 timed samples: an entry whose spread exceeds
    # ~2x is a session-noise suspect (VERDICT r10 item 5 — the r10
    # winnowing 11x was exactly this) and must be re-measured in a
    # dedicated fresh session before its ratio is believed
    "sample_spread": {
        n: round(max(v) / min(v), 2) if min(v) else None
        for n, v in samples.items()
    },
    "excluded": EXCLUDED,
    "value_sf01": round(sum(ref_timings.values()), 3),
    "sf": 1.0,
    "note": ("synthetic sf1.0: 10 key-shifted copies of sf0.1 "
             "(/tmp/gen_sf1.py recipe; docs near-dup-tagged, embeddings "
             "noise-decorrelated); local[32], median of 3 after warm "
             "pass; sf0.1 reference timed in the SAME session so the "
             "10x-data ratio is host-noise-free"),
}
if ONLY:
    with open("/root/repo/BENCH_SCALE.json") as fh:
        prev = json.load(fh)
    for key in ("queries", "queries_min", "queries_sf01_same_session",
                "ratio_vs_sf01", "sample_spread"):
        prev[key].update(out[key])
    prev["value"] = round(sum(prev["queries"].values()), 3)
    prev["value_sf01"] = round(
        sum(prev["queries_sf01_same_session"].values()), 3
    )
    prev["note"] = prev["note"] + (
        "; supplementary same-session run merged for: " + ", ".join(ONLY)
    )
    out = prev
with open("/root/repo/BENCH_SCALE.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps({k: v for k, v in out.items()
                  if k not in ("queries_min", "queries_sf01_same_session")}))

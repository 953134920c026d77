"""Local mirror of the driver's correctness gate: run every ``queries()``
entry on Spark AND its ``oracle_sql()`` on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

Runs at sf0.001 by default (fast); set BDV_ORACLE_SF_DIR=/root/testdata/sf0.01
to replicate the driver's exact scale.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("BDV_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, normalize
    numeric noise, sort rows.

    Decimals normalize to their exact ``as_tuple()`` (sign, digits,
    exponent) under a type tag of their own — NOT ``str()``.  The
    round-7 driver hash break proved the old str-fold masked real
    divergence: two engines can materialize a wide decimal as
    different Python classes (decimal128 → float64/object) or
    different scales, and a string fold of equal-looking values cannot
    catch it.  The mirror must fail wherever the driver's value-hash
    would."""
    import decimal

    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, decimal.Decimal):
            return ("d", v.as_tuple())
        return ("s", str(v))

    return sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)


ORACLES = E.oracle_sql()
ALL_QUERIES = E.queries()


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["rule_name", "violation_count"]


#: Oracles whose constants are pinned at the driver's sf0.01 (deterministic
#: seeds over fixed testdata).  At other scales the full compare is replaced
#: by the scale-free invariant (full-probe IVF == brute force exactly).
SF_PINNED = {"sim_ann_recall"}


def _assert_no_decimal_output(name, schema):
    """Hash-discipline pin (VERDICT r7 §What's-wrong 1): no oracled
    entry may SHIP a DecimalType column.  Every historically
    driver-green entry ships BIGINT/DOUBLE/VARCHAR/DATE/BOOL; the only
    three DECIMAL(38,x) outputs ever shipped (agg_incremental_totals,
    streaming_incremental_mv, ts_twap_daily, round 7) all failed the
    driver's value-hash with rows+schema green — decimal128
    canonicalization diverges between the two engines' materialization
    layers.  Exact money/weighted math stays DECIMAL *internally* and
    ships integer units in BIGINT (cdc_apply_changeset's deci-cents,
    _mv_total_micro, the TWAP num_qus guard)."""
    from pyspark.sql.types import DecimalType

    offenders = [
        f.name for f in schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not offenders, (
        f"{name}: shipped DecimalType columns {offenders} — convert to "
        "integer-unit BIGINT (see _mv_total_micro / cdc deci-cents)"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    if name in SF_PINNED and not SF_DIR.rstrip("/").endswith("sf0.01"):
        rows = {r["method"]: r for r in ALL_QUERIES[name](spark, SF_DIR).collect()}
        assert rows["ivf_full_probe"]["recall"] == 1.0, rows
        assert rows["ivf_full_probe"]["hits"] == 50, rows
        assert set(rows) == {"ivf_full_probe", "ivf_nprobe4", "lsh"}
        return
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    _assert_no_decimal_output(name, sdf.schema)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = normalize([list(r) for r in spark_rows], [c.lower() for c in spark_cols])
    want = normalize([list(r) for r in duck_rows], [c.lower() for c in duck_cols])
    mismatches = [
        (g, w) for g, w in zip(got, want) if g != w
    ]
    assert got == want, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_oracle_less_query_runs(spark, name):
    """Rows-only check for non-SQL-expressible queries (same as driver)."""
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0


def test_driver_window_is_all_oracled():
    """The driver records CORRECTNESS rows for the first 50 registry
    entries only; every one of those slots must carry an oracle so no
    hash-checkable query is wasted outside the window — except the
    explicitly seated rows-only sketch kernels (VERDICT r7 item 3:
    hash-dependent outputs can't be oracled, but each must appear in
    at least one CORRECTNESS file even as a rows-only record)."""
    from big_data_validator_spark.queries import (
        REGISTRY,
        _DRIVER_WINDOW_SIZE,
        _SEATED_ROWS_ONLY,
    )

    names = list(REGISTRY)
    window = names[:_DRIVER_WINDOW_SIZE]
    assert all(
        REGISTRY[n].oracle or n in _SEATED_ROWS_ONLY for n in window
    ), [
        n
        for n in window
        if not REGISTRY[n].oracle and n not in _SEATED_ROWS_ONLY
    ]
    assert set(_SEATED_ROWS_ONLY) <= set(window)
    # Every LLM-pipeline family the judge grades must sit in-window
    # (membership rotates — see _DEMOTED_TO_TAIL — but each family keeps
    # at least one seat).
    for required in [
        # (dedup_fuzzy_levenshtein got green r4-r8 rows and rests in
        # r9; dedup_ssjoin_prefix + dedup_semantic_clusters keep the
        # pairwise-similarity dedup family seats.  sample_weighted_orders
        # got green r5-r8 rows and rests in r9; sample_cluster_split
        # keeps the sampling family seat.)
        # (round-10 rests, each with a fresh r9 green:
        # multimodal_resize_stats → multimodal_payload_stats re-seated;
        # pipeline_curate_pack → pack_sequences_docs re-seated;
        # corpus_mixture_apply → corpus_mixture_plan re-seated;
        # train_shuffle_shards → sample_cluster_split keeps sampling;
        # emb_near_dup_pairs/clusters → sim_ann_exactint +
        # emb_norm_stats keep exact-integer embedding coverage;
        # cdc_apply_changeset → cdc_schema_changeset + three IVM
        # entries keep CDC; dedup_shared_substrings and
        # streaming_kll_quantiles got their first greens in r9 and
        # yield their seats to the r10 additions.)
        "sim_ann_recall",  # recomputes brute-force cosine as ground truth
        # (text_unigram_lm_score got green r7-r10 rows and rests in
        # r11; the tokenizer entries recompute its wordcount/vocab
        # device and the scoring stays pytest-pinned)
        # (quality_gopher_flags got green r5-r7 rows and rests in r8;
        # the mixture/packing entries recompute the same gates)
        # (pii_redaction_scan got green r5-r10 rows — six driver
        # rounds — and rests in r11; rule_k_anonymity keeps the
        # curation-family seat and the PII regexes stay fixture-pinned)
        # (contamination_probes got green r5-r7 rows and rests in r8;
        # the automaton-parity pytest pins its semantics)
        # (cdc_changeset_orders got green r5-r7 rows and rests in r8;
        # cdc_schema_changeset runs the same changeset device)
        # (drift_text_kl got green r6-r8 rows and rests in r9;
        # streaming_drift_psi + drift_psi_totalprice keep drift seats.
        # mining_frequent_pairs got green r5-r8 rows and rests in r9;
        # graph_triangle_count recomputes the same support device
        # in-window every round)
        # (gen_synthetic_validated got green r5-r8 rows and rests in
        # r9; its validation chain is the same contract rules the
        # in-window rule_* entries run, pytest-pinned)
        # round-6 additions: each must get its driver-green row
        # (rule_profile_trend_anomaly got green r6-r9 rows and rests
        # in r10; the trend-z device stays pytest-pinned and both FD
        # profile entries keep the family seats)
        # (text_bpe_encode got green r6+r7 rows and rests in r8;
        # text_bpe_learn + pipeline_bpe_pack keep the BPE family seats)
        # (streaming_attribution_left got green r6-r10 rows — five
        # driver rounds — and rests in r11; four streaming siblings
        # keep the family seats and the LEFT OUTER null-emission
        # protocol stays pytest-pinned)
        # (ts_resample_ffill got green r7+r8 rows and rests in r9;
        # ts_rollup_cascade + ts_twap_daily keep the timeseries seats)
        "pipeline_bpe_pack",
        # round-7 additions: each must get its driver-green row
        # (join_asof_forward got its green r7 row and rests in r8;
        # join_point_in_time keeps the as-of family seat)
        # (streaming_metrics_trend got green r7-r9 rows and rests in
        # r10; three streaming siblings keep the family seats and the
        # repository protocol stays pytest-pinned)
        "layout_compaction_plan",
        # (sim_ann_exactint got green r7-r10 rows and rests in r11;
        # the in-window semantic-dedup entry + sim_ann_recall keep
        # exact-integer embedding coverage)
        # (join_point_in_time got green r7-r11 rows and rests in r12;
        # the re-seated join_asof_orders_events keeps the as-of family
        # seat and the TTL/age grid stays pytest-pinned)
        # (streaming_drift_psi got green r7-r10 rows and rests in r11;
        # three streaming siblings keep the family seats and the
        # per-batch PSI protocol stays pytest-pinned)
        # (text_bpe_learn got green r7-r10 rows and rests in r11; the
        # unigram trainer/encoder + pipeline_bpe_pack keep the
        # tokenizer family seats)
        "rule_k_anonymity",
        # (agg_incremental_totals got green r7-r10 rows and rests in
        # r11; streaming_incremental_mv + agg_incremental_join_mv keep
        # the IVM family seats)
        # (profile_fd_discovery got green r7-r10 rows and rests in
        # r11; profile_fd_composite keeps the FD family seat)
        # (link_part_entities got green r5-r10 rows — six driver
        # rounds — and rests in r11; link_fs_em + link_fs_classify
        # keep the linkage family seats)
        # (streaming_incremental_mv got green r7-r10 rows and rests in
        # r11; agg_incremental_join_mv keeps the IVM family seat and
        # the streaming family keeps three seats)
        # (ts_twap_daily got green r7-r9 rows and rests in r10; the
        # TWAP integer-accumulation device stays pytest-pinned and
        # ts_rollup_cascade keeps the timeseries seat)
        # (scan_observed_metrics got green r7-r9 rows and rests in
        # r10; its zero-extra-scan plumbing stays plan-pinned and the
        # re-seated rule_* entries hash the same fused aggregates)
        # round-8 additions: each must get its driver row
        # (the seven rows-only sketch kernels got their CORRECTNESS_r08
        # records and leave the window in r9 — _SEATED_ROWS_ONLY is
        # empty; oracled twins keep their families covered)
        # (agg_incremental_minmax got green r8-r10 rows and rests in
        # r11; the refresh device stays pytest-pinned)
        "profile_fd_composite",
        # (sample_cluster_split got green r7-r11 rows and rests in
        # r12; the re-seated sample_stratified_orders keeps the
        # sampling family seat and the group-leakage determinism stays
        # pytest-pinned)
        # (join_salted_skew got green r8+r9 rows and rests in r10; the
        # salting device stays pinned by tests/test_aqe_skew.py and
        # tests/test_advice_r8.py)
        # round-8 second-wave additions
        "dedup_ssjoin_prefix", "agg_incremental_join_mv",
        # (ts_rollup_cascade got green r8-r10 rows and rests in r11;
        # ts_theilsen_trend takes the timeseries seat and the cascade
        # grid stays pytest-pinned)
        # (topk_pareto_frontier got green r8-r10 rows and rests in
        # r11; topk_order_values keeps the top-k family seat)
        # (rule_outlier_mad got green r8-r10 rows and rests in r11;
        # the rule family keeps four in-window seats and the MAD
        # device stays pytest-pinned)
        "graph_pagerank_flow",
        # (events_rolling_distinct got green r8-r10 rows and rests in
        # r11; events_markov_transitions takes the events seat)
        # round-9 additions: each must get its driver row
        # (agg_kll_mergeable rests in r12 with green r9-r11 rows;
        # streaming_kll_by_group keeps the KLL family seat)
        "dedup_semantic_clusters",
        # (graph_label_propagation got green r9+r10 rows and rests in
        # r11; pagerank + triangle keep the graph family seats)
        # (cdc_schema_changeset got green r9+r10 rows and rests in
        # r11; both SCD2 entries keep the CDC family seats)
        # (the five round-9 r1-vintage re-validation seats got their
        # fresh r9 records and rest in r10)
        # round-9 second wave: the rolling-percentile payoff query
        # and the graph-motif member
        # (agg_kll_rolling got green r9+r10 rows and rests in r11;
        # three KLL siblings keep the family seats.
        # graph_triangle_count got green r9-r11 rows and rests in r12;
        # graph_pagerank_flow keeps the graph family seat and the
        # support-counting device stays pytest-pinned)
        # round-10 additions: each got its driver row r10+r11;
        # agg_kll_by_segment, dedup_semantic_autok and
        # dedup_semantic_twolevel rest in r12 (agg_kll_mergeable +
        # streaming_kll_by_group keep KLL; dedup_semantic_clusters
        # keeps the semantic tier)
        # (cdc_scd2_history, graph_triangle_count,
        # multimodal_phash_neardup and agg_kll_mergeable rest in r12
        # with green r9-r11 rows; streaming_scd2_history keeps
        # CDC/SCD2, graph_pagerank_flow the graph family, the
        # re-seated multimodal_frame_sample the multimodal family, and
        # streaming_kll_by_group the KLL family)
        "streaming_kll_by_group",
        "streaming_scd2_history",
        # (the r5-vintage block re-validated in r11 — agg_pricing_
        # summary, supplier_acctbal_by_nation, pivot_priority_status,
        # window_dedup_rank, join_full_outer_reconcile,
        # join_semi_returned_orders, agg_salted_skew_counts,
        # topk_order_values, rule_domain_range, events_json_extract —
        # rests in r12 with fresh r11 greens; the re-seated r4-vintage
        # block keeps the star-join/agg/top-k/pivot shapes in-window)
        # (round-11 first exposures each got their r11 green and rest
        # in r12: dedup_shared_substrings, text_unigram_learn/encode,
        # link_fs_em/classify, events_markov_transitions,
        # rule_monotonic_orderdate, dedup_ngram_containment,
        # events_survival_km, agg_time_decayed_value,
        # rule_conversion_ztest, events_attribution_removal,
        # text_pmi_collocations, streaming_markov_drift,
        # drift_wasserstein_by_year, sim_matryoshka_recall — family
        # seats per the _DEMOTED_TO_TAIL rationale block)
        # operators REWRITTEN in round 12 stay seated for a fresh
        # record: the distributed-median Theil-Sen, the point-mass W1
        # fix, the bounded-dense-leg hybrid RRF, and the refactored
        # contamination screen
        "ts_theilsen_trend", "drift_wasserstein", "sim_hybrid_rrf",
        "contamination_ngram_overlap",
        # round-12 re-validation seats (VERDICT r11 item 3): the 26
        # r4-vintage greens — the oldest un-revalidated records —
        # return for fresh driver rows
        "join_shipping_priority", "agg_percentiles",
        "set_intersect_priority_profiles", "join_asof_orders_events",
        "text_chunk_windows", "dedup_ngram_jaccard",
        "sim_bruteforce_topk", "events_sessionize",
        "rule_column_names", "agg_rollup_region_nation",
        "text_profile", "rule_uniqueness_metrics", "rule_completeness",
        "scan_pushdown_projection", "rule_type_enforcement",
        "streaming_failure_sink", "join_region_revenue",
        "streaming_windowed_violations", "pipeline_curate_corpus",
        "scan_permissive_roundtrip", "rule_field_count_naive",
        "rule_referential_integrity", "text_tfidf_top_terms",
        "multimodal_frame_sample", "sample_stratified_orders",
        "dedup_exact_keep_first",
        # round-12 additions: each must get its driver row
        "contamination_ngram_bloom", "quality_linear_score",
        "curation_dsir_weights", "sim_sq8_recall",
        "link_golden_record",
        # round-12 second wave
        "drift_mannwhitney", "link_sorted_neighborhood",
        # round-12 third wave
        "agg_winsorized_stats", "sim_kcenter_coreset",
    ]:
        assert required in window, required


def test_every_oracled_entry_reaches_the_driver_window():
    """Rotation contract (VERDICT r4 §7): no oracled entry may live its
    whole life outside the driver's 50-slot correctness window.  Every
    oracled registry entry must either already have a row in a
    checked-in CORRECTNESS_r*.json or hold a seat in the CURRENT window
    (so it gets its row this round).  Red if a rotation is reverted
    without first having shipped a driver-green round."""
    import glob
    import json

    from big_data_validator_spark.queries import (
        REGISTRY,
        _DRIVER_WINDOW_SIZE,
        all_oracles,
    )

    seen: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        with open(path) as fh:
            recorded = json.load(fh)
        # only driver-GREEN rows count as coverage; a recorded failure
        # doesn't retire an entry's need for a green round
        seen |= {
            n
            for n, row in recorded.items()
            if isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
        }
    window = set(list(REGISTRY)[:_DRIVER_WINDOW_SIZE])
    orphans = [n for n in all_oracles() if n not in seen and n not in window]
    assert not orphans, (
        f"oracled entries never driver-checked and not scheduled: {orphans}"
    )

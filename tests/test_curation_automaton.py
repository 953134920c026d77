from __future__ import annotations

import pytest

from big_data_validator_spark.operators.curation import (
    _ac_search_ids,
    _build_aho_corasick,
    contamination_probe_counts,
    contamination_probe_counts_automaton,
)


def test_automaton_matches_python_reference():
    probes = [
        (1, "he"),
        (2, "she"),
        (3, "his"),
        (4, "hers"),
        (5, "she"),  # duplicate pattern, distinct id
    ]
    auto = _build_aho_corasick(probes)
    cases = ["ushers", "this", "ahishers", "xyz", "hehehe", ""]
    for text in cases:
        want = {pid for pid, pat in probes if pat in text}
        assert _ac_search_ids(auto, text) == want, text


def test_automaton_overlapping_and_nested_probes():
    # probe fully inside another, shared prefixes, single chars
    probes = [(1, "a"), (2, "ab"), (3, "abc"), (4, "bc"), (5, "c")]
    auto = _build_aho_corasick(probes)
    assert _ac_search_ids(auto, "abc") == {1, 2, 3, 4, 5}
    assert _ac_search_ids(auto, "ab") == {1, 2}
    assert _ac_search_ids(auto, "zc") == {5}


def test_automaton_path_equals_jvm_broadcast_path(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick brown stuff"),
            (3, "nothing here"),
            (4, "very quick brown fox indeed"),
            (5, None),
            (None, "quick brown null id"),  # null id: excluded like JVM
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(1, "quick brown"), (3, "zebra"), (4, "fox")],
        "probe_id long, probe string",
    )
    jvm = sorted(
        tuple(r)
        for r in contamination_probe_counts(
            corpus.filter("text is not null"),
            probes,
            corpus_id_col="doc_id",
        ).collect()
    )
    ac = sorted(
        tuple(r)
        for r in contamination_probe_counts_automaton(
            corpus, probes, corpus_id_col="doc_id"
        ).collect()
    )
    assert ac == jvm
    assert dict(ac) == {1: 2, 3: 0, 4: 1}


def test_automaton_rejects_empty_probe(spark):
    corpus = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    probes = spark.createDataFrame(
        [(1, "")], "probe_id long, probe string"
    )
    with pytest.raises(ValueError):
        contamination_probe_counts_automaton(corpus, probes)


def test_automaton_path_on_registry_shape(spark):
    """Same probe construction as the registry query; the automaton
    path must reproduce the oracle-checked BNLJ result."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = d.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", 1, 16).alias("probe"),
    )
    jvm = sorted(
        tuple(r)
        for r in contamination_probe_counts(
            d, probes, corpus_id_col="doc_id"
        ).collect()
    )
    ac = sorted(
        tuple(r)
        for r in contamination_probe_counts_automaton(
            d, probes, corpus_id_col="doc_id"
        ).collect()
    )
    assert ac == jvm


def test_automaton_rejects_non_integral_corpus_ids(spark):
    """ADVICE r5: the Arrow batch schema pins ids as long; a string id
    used to crash the pandas worker mid-job — now fails at plan time."""
    corpus = spark.createDataFrame(
        [("u-1", "some text")], "doc_id string, text string"
    )
    probes = spark.createDataFrame(
        [(1, "text")], "probe_id long, probe string"
    )
    with pytest.raises(ValueError, match="integral"):
        contamination_probe_counts_automaton(
            corpus, probes, corpus_id_col="doc_id"
        )


def test_automaton_rejects_one_id_many_strings(spark):
    corpus = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    probes = spark.createDataFrame(
        [(7, "ab"), (7, "bc")], "probe_id long, probe string"
    )
    with pytest.raises(ValueError, match="multiple distinct probe"):
        contamination_probe_counts_automaton(
            corpus, probes, corpus_id_col="doc_id"
        )


def test_duplicate_probe_rows_dedup_in_both_paths(spark):
    """ADVICE r5: an exactly-duplicated probe row must not double-count
    its hits in the JVM path (the automaton path inherently dedups)."""
    corpus = spark.createDataFrame(
        [(1, "needle in a haystack"), (2, "no match here")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(10, "needle"), (10, "needle"), (11, "haystack")],
        "probe_id long, probe string",
    )
    for fn in (
        contamination_probe_counts,
        contamination_probe_counts_automaton,
    ):
        got = {
            r["probe_id"]: r["n_contaminated"]
            for r in fn(corpus, probes, corpus_id_col="doc_id").collect()
        }
        assert got == {10: 1, 11: 1}, fn.__name__

"""Property-based tests for the round-5 operators: for ARBITRARY inputs
(not just the curated fixtures), each operator must agree with a direct
Python reference computation."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_validator_spark.operators.cdc import snapshot_changeset
from big_data_validator_spark.operators.relational import (
    equidepth_histogram,
    key_gaps,
)


@pytest.fixture(scope="module")
def sp(spark):
    # hypothesis re-invokes tests many times; share one session
    return spark


_cell = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))


@given(
    cur=st.dictionaries(
        st.integers(0, 15), st.tuples(_cell, _cell), max_size=10
    ),
    inc=st.dictionaries(
        st.integers(0, 15), st.tuples(_cell, _cell), max_size=10
    ),
)
@settings(max_examples=15, deadline=None)
def test_cdc_matches_dict_diff(sp, cur, inc):
    """snapshot_changeset == a plain dict diff for ANY pair of keyed
    snapshots with nullable cells."""
    schema = "k long, a int, b int"
    cur_df = sp.createDataFrame(
        [(k, v[0], v[1]) for k, v in cur.items()], schema
    )
    inc_df = sp.createDataFrame(
        [(k, v[0], v[1]) for k, v in inc.items()], schema
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_changeset(cur_df, inc_df, ["k"]).collect()
    }
    want = {}
    for k in set(cur) | set(inc):
        if k not in inc:
            want[k] = "delete"
        elif k not in cur:
            want[k] = "insert"
        elif cur[k] != inc[k]:
            want[k] = "update"
    assert got == want


@given(
    keys=st.lists(st.integers(min_value=-50, max_value=50), max_size=30),
    block=st.integers(min_value=2, max_value=64),
)
@settings(max_examples=15, deadline=None)
@pytest.mark.slow
def test_key_gaps_matches_reference(sp, keys, block):
    """key_gaps == sorted-scan reference for ANY key multiset (including
    negatives and duplicates) and ANY block size."""
    df = sp.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        tuple(r) for r in key_gaps(df, "k", block_size=block).collect()
    )
    ks = sorted(set(keys))
    want = [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(ks, ks[1:])
        if b - a > 1
    ]
    assert got == want


@given(
    values=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=1, max_size=40
    ),
    n_bins=st.integers(min_value=1, max_value=8),
    width=st.sampled_from([0.7, 2.0, 50.0]),
)
@settings(max_examples=15, deadline=None)
@pytest.mark.slow
def test_equidepth_matches_reference(sp, values, n_bins, width):
    """equidepth_histogram == cumulative-scan reference for ANY value
    multiset, bin count, and block width."""
    from collections import Counter

    df = sp.createDataFrame([(float(v),) for v in values], "v double")
    got = sorted(
        tuple(r)
        for r in equidepth_histogram(
            df, "v", n_bins=n_bins, block_width=width
        ).collect()
    )
    cnt = Counter(float(v) for v in values)
    total = len(values)
    bins: dict = {}
    ce = 0
    for v in sorted(cnt):
        b = min((ce * n_bins) // total, n_bins - 1)
        row = bins.setdefault(b, [0, v, v])
        row[0] += cnt[v]
        row[2] = v
        ce += cnt[v]
    want = sorted((b, n, mn, mx) for b, (n, mn, mx) in bins.items())
    assert got == want

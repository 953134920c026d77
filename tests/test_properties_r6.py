"""Property-based tests for the round-6 operators: for ARBITRARY inputs
(not just curated fixtures), each must agree with a direct Python
reference computation."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_validator_spark.operators.cdc import (
    apply_changeset,
    snapshot_changeset,
)
from big_data_validator_spark.operators.text import (
    BPE_DEMO_MERGES,
    bpe_encode_tokens,
)
from big_data_validator_spark.operators.timeseries import (
    resample_ffill_daily,
)


@pytest.fixture(scope="module")
def sp(spark):
    # hypothesis re-invokes tests many times; share one session
    return spark


def _bpe_reference(word, merges):
    ranks = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        best = min((ranks.get(p, len(merges)), p) for p in pairs)
        if best[0] == len(merges):
            break
        a, b = best[1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=14
)


@given(words=st.lists(_word, min_size=1, max_size=12))
@settings(max_examples=15, deadline=None)
def test_bpe_encode_matches_reference_for_arbitrary_words(sp, words):
    """The replace-chain encoder == the textbook lowest-rank-pair loop
    for ANY [a-z0-9]+ word, and segmentation is lossless."""
    df = sp.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", bpe_encode_tokens(F.col("w")).alias("toks")
        ).distinct().collect()
    }
    for w in set(words):
        assert got[w] == _bpe_reference(w, BPE_DEMO_MERGES), w
        assert "".join(got[w]) == w


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),                 # key
            st.integers(0, 20),                # day offset
            st.floats(-10, 10, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None)
@pytest.mark.slow
def test_resample_ffill_matches_python_reference(sp, events):
    """Spine coverage, gap flags, and carried values == a dict-based
    reference for arbitrary sparse per-key event sets."""
    base = dt.datetime(2024, 5, 1)
    rows = [
        (k, base + dt.timedelta(days=d, hours=1), float(v))
        for k, d, v in events
    ]
    df = sp.createDataFrame(rows, "k long, ts timestamp, value double")
    got = {
        (r["k"], str(r["day"])): r
        for r in resample_ffill_daily(df, "k").collect()
    }

    # python reference
    from collections import defaultdict

    daily = defaultdict(lambda: defaultdict(list))
    for k, d, v in events:
        daily[k][d].append(float(v))
    want_rows = 0
    for k, days in daily.items():
        lo, hi = min(days), max(days)
        carried = None
        for d in range(lo, hi + 1):
            day = str((base + dt.timedelta(days=d)).date())
            r = got[(k, day)]
            want_rows += 1
            if d in days:
                carried = sum(days[d])
                assert r["n_events"] == len(days[d])
                assert r["is_gap"] is False
                assert abs(r["day_value"] - carried) < 1e-6
            else:
                assert r["n_events"] == 0 and r["is_gap"] is True
                assert r["day_value"] is None
            assert abs(r["filled_value"] - carried) < 1e-6
    assert len(got) == want_rows


_cell = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))


@given(
    cur=st.dictionaries(st.integers(0, 12), st.tuples(_cell, _cell), max_size=8),
    inc=st.dictionaries(st.integers(0, 12), st.tuples(_cell, _cell), max_size=8),
)
@settings(max_examples=15, deadline=None)
@pytest.mark.slow
def test_apply_changeset_roundtrip_for_arbitrary_snapshots(sp, cur, inc):
    """apply(current, diff(current, incoming)) == incoming for ANY pair
    of keyed snapshots with nullable cells."""
    schema = "k long, a int, b int"
    cur_df = sp.createDataFrame(
        [(k, a, b) for k, (a, b) in cur.items()], schema
    )
    inc_df = sp.createDataFrame(
        [(k, a, b) for k, (a, b) in inc.items()], schema
    )
    cs = snapshot_changeset(cur_df, inc_df, ["k"], include_payload=True)
    nxt = apply_changeset(cur_df, cs, ["k"])
    assert sorted(map(tuple, nxt.collect())) == sorted(
        (k, a, b) for k, (a, b) in inc.items()
    )

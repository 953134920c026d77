"""Property-based tests for the round-13 drift/changepoint operators:
for ARBITRARY inputs (not just curated fixtures), Cramér–von Mises must
agree with a from-scratch midrank replay of Anderson's rank form at any
block width, and binary segmentation must agree with a direct recursive
Python replay of the exact-integer CUSUM recursion — including negative
values (truncating division) and degenerate segments."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_validator_spark.operators.relational import cramer_von_mises
from big_data_validator_spark.operators.timeseries import binseg_changepoints


@pytest.fixture(scope="module")
def sp(spark):
    # hypothesis re-invokes tests many times; share one session
    return spark


# small value range forces heavy ties; sizes stay tiny for speed
_sample = st.lists(st.integers(-5, 8), min_size=0, max_size=14)


def _cvm_ref(x, y):
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return None
    cnt = Counter(x) + Counter(y)
    below, mid = 0, {}
    for v in sorted(cnt):
        mid[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    u = n * sum((mid[v] - (i + 1)) ** 2 for i, v in enumerate(sorted(x)))
    u += m * sum((mid[v] - (j + 1)) ** 2 for j, v in enumerate(sorted(y)))
    nn = n + m
    return round(u / (n * m * nn) - (4 * n * m - 1) / (6 * nn), 6)


@settings(max_examples=25, deadline=None)
@given(a=_sample, b=_sample, bw=st.sampled_from([1, 3, 1 << 20]))
@pytest.mark.slow
def test_cvm_matches_midrank_reference_any_block_width(sp, a, b, bw):
    """cramer_von_mises == the float midrank reference (to the shared
    round-6 contract) for arbitrary tie-heavy samples, at every block
    width — the closed-form integer tie-group accumulation may not
    depend on how values land in blocks; an empty side must be NULL."""
    adf = sp.createDataFrame([(v,) for v in a], "v long")
    bdf = sp.createDataFrame([(v,) for v in b], "v long")
    got = cramer_von_mises(adf, bdf, "v", bin_width=bw).collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    want = _cvm_ref(a, b)
    if want is None:
        assert got["cvm_t"] is None
    else:
        assert abs(got["cvm_t"] - want) < 2e-6, (got["cvm_t"], want)


BASE = dt.date(2024, 1, 1)


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _one_split(vals):
    n, total = len(vals), sum(vals)
    if n < 2:
        return None
    absd, negt = max(
        (abs(n * sum(vals[:t]) - t * total), -t) for t in range(1, n)
    )
    t = -negt
    ppm = 0 if total == 0 else (absd * 10**6) // (n * abs(total))
    pfx = sum(vals[:t])
    return (
        t,
        n,
        ppm,
        _trunc_div(pfx, t),
        _trunc_div(total - pfx, n - t),
    )


def _replay(vals, lo, level, depth, out):
    if level > depth:
        return
    s = _one_split(vals)
    if s is None:
        return
    t = s[0]
    out.append((level, lo, lo + t - 1) + s)
    _replay(vals[:t], lo, level + 1, depth, out)
    _replay(vals[t:], lo + t, level + 1, depth, out)


@settings(max_examples=20, deadline=None)
@given(
    cents=st.lists(st.integers(-300, 900), min_size=0, max_size=16),
    depth=st.sampled_from([1, 2]),
)
@pytest.mark.slow
def test_binseg_matches_recursive_replay(sp, cents, depth):
    """binseg_changepoints == the direct recursive replay for arbitrary
    series (negative totals exercise the truncating-division and
    abs(total) ppm paths; short segments must vanish, not crash)."""
    rows = [
        (BASE + dt.timedelta(days=i), c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = sp.createDataFrame(rows, "d date, v double")
    got = sorted(
        (
            r["level"],
            (r["seg_start"] - BASE).days,
            (r["split_date"] - BASE).days,
            r["t_index"],
            r["n_days"],
            r["cusum_ppm"],
            r["mean_before_cents"],
            r["mean_after_cents"],
        )
        for r in binseg_changepoints(df, "d", "v", depth=depth).collect()
    )
    exp: list = []
    _replay([int(c) for c in cents], 0, 1, depth, exp)
    assert got == sorted(exp), (got, exp)

"""One-pass column profiler: values, schema stability, and the
single-scan plan guarantee."""

from __future__ import annotations

import pytest

from big_data_validator_spark.operators.profile import profile_table
from big_data_validator_spark.plans.inspect import shuffle_count


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [(1, 10.0, "aa"), (2, 20.0, None), (3, None, "cccc"), (3, 40.0, "b")],
        ["k", "x", "s"],
    )


def test_profile_values(spark, toy):
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(toy).collect()
    }
    assert got[("k", "row_count")] == 4.0
    assert got[("k", "null_count")] == 0.0
    assert got[("k", "distinct_count")] == 3.0
    assert got[("x", "null_count")] == 1.0
    assert got[("x", "min")] == 10.0 and got[("x", "max")] == 40.0
    assert got[("x", "mean")] == pytest.approx(70.0 / 3, abs=1e-6)
    assert got[("s", "null_count")] == 1.0
    assert got[("s", "min_length")] == 1.0
    assert got[("s", "max_length")] == 4.0
    assert got[("s", "avg_length")] == pytest.approx(7.0 / 3, abs=1e-6)


def test_profile_temporal_columns(spark):
    """DATE and TIMESTAMP columns profile to epoch-second bounds (plus
    the universal null/distinct/row metrics), with the session pinned
    UTC so wall-clock and epoch agree."""
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (DATE '1995-01-01', TIMESTAMP '2001-08-01 12:30:00'),
          (DATE '2000-06-15', NULL),
          (NULL,              TIMESTAMP '1995-01-01 00:00:00')
        AS t(d, ts)
        """
    )
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df).collect()
    }
    assert got[("d", "row_count")] == 3.0
    assert got[("d", "null_count")] == 1.0
    assert got[("d", "distinct_count")] == 2.0
    assert got[("d", "min_epoch_s")] == 788918400.0   # 1995-01-01 UTC
    assert got[("d", "max_epoch_s")] == 961027200.0   # 2000-06-15 UTC
    assert got[("ts", "null_count")] == 1.0
    assert got[("ts", "min_epoch_s")] == 788918400.0
    assert got[("ts", "max_epoch_s")] == 996669000.0  # 2001-08-01 12:30 UTC


def test_profile_schema_is_stable_and_single_pass(spark, toy):
    a = profile_table(toy, ["k"])
    b = profile_table(toy, ["k", "x", "s"])
    assert a.columns == b.columns == ["column", "metric", "value"]
    # one aggregation over one scan: profiling more columns must not add
    # shuffles (COUNT DISTINCT adds a fixed expand, not per-column scans)
    assert shuffle_count(b) <= shuffle_count(a) + 1


def test_profile_approx_distinct_path(spark, toy):
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(toy, ["k"], exact_distinct=False).collect()
    }
    # HLL at this cardinality is exact
    assert got[("k", "distinct_count")] == 3.0

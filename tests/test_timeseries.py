"""Per-key daily resample + forward fill: gap materialization, fill
semantics, and the no-global-window plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.operators.timeseries import (
    resample_ffill_daily,
)


@pytest.fixture()
def feed(spark):
    rows = [
        # key 1: days 1, 2, 5 — gaps on 3 and 4
        (1, "2024-03-01 10:00:00", 10.0),
        (1, "2024-03-01 11:00:00", 5.0),
        (1, "2024-03-02 09:00:00", 7.0),
        (1, "2024-03-05 23:59:59", 1.0),
        # key 2: single day
        (2, "2024-03-10 00:00:00", 4.0),
        # null key / null ts: excluded
        (None, "2024-03-01 00:00:00", 9.0),
        (3, None, 9.0),
    ]
    return spark.createDataFrame(
        rows, ["k", "ts_str", "value"]
    ).select("k", F.col("ts_str").cast("timestamp").alias("ts"), "value")


def test_resample_fills_gaps_and_carries_values(spark, feed):
    out = {
        (r["k"], str(r["day"])): r
        for r in resample_ffill_daily(feed, "k").collect()
    }
    # key 1 spine: exactly 5 consecutive days
    k1 = sorted(d for (k, d) in out if k == 1)
    assert k1 == [f"2024-03-0{i}" for i in range(1, 6)]
    assert out[(1, "2024-03-01")]["n_events"] == 2
    assert out[(1, "2024-03-01")]["day_value"] == 15.0
    assert out[(1, "2024-03-01")]["is_gap"] is False
    # gap days: zero events, NULL day_value, carried fill
    for gap_day, want_fill in [("2024-03-03", 7.0), ("2024-03-04", 7.0)]:
        r = out[(1, gap_day)]
        assert r["n_events"] == 0 and r["day_value"] is None
        assert r["is_gap"] is True and r["filled_value"] == want_fill
    # a new data day resets the fill
    assert out[(1, "2024-03-05")]["filled_value"] == 1.0
    # single-day key: one row, no gaps
    assert [k for (k, _) in out if k == 2] == [2]
    assert out[(2, "2024-03-10")]["filled_value"] == 4.0
    # null key and null ts rows are excluded entirely
    assert not any(k in (None, 3) for (k, _) in out)


def test_resample_window_partitions_by_key(spark, feed):
    plan = (
        resample_ffill_daily(feed, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the running fill window must be keyed — a global single-partition
    # sort would appear as an empty partition list
    assert "Window" in plan
    assert "hashpartitioning(k" in plan, plan


def test_resample_registry_matches_duckdb(spark):
    import duckdb

    from big_data_validator_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    spec = REGISTRY["ts_resample_ffill"]
    got = sorted(
        tuple(r) for r in spec.fn(spark, sf_dir).collect()
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want and len(got) > 0


def test_time_weighted_daily_avg_known_values(spark):
    """TWAP vs hand arithmetic: a value holding most of the day
    dominates a brief spike regardless of sample count; last
    observation holds to end-of-day; NULL values excluded; per-day
    isolation."""
    import datetime as dt
    from decimal import Decimal

    from big_data_validator_spark.operators.timeseries import (
        time_weighted_daily_avg,
    )

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [
        (1, 101, T(0), 10.0),     # holds 0:00 -> 12:00 (12h)
        (1, 102, T(12), 30.0),    # holds 12:00 -> 12:01 (1 min)
        (1, 103, T(12, 1), 10.0), # holds 12:01 -> 24:00
        (1, 104, T(6), None),     # NULL: excluded entirely
        (2, 201, T(8), 50.0),     # alone: holds 8:00 -> 24:00
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r["user_id"]: r
        for r in time_weighted_daily_avg(
            df, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    r1 = got[1]
    us = 3_600_000_000
    num = 1000 * 12 * us + 3000 * 1 * us // 60 + 1000 * (12 * us - us // 60)
    assert r1["n_obs"] == 3
    assert int(r1["num_qus"]) == num
    assert r1["den_us"] == 24 * us
    assert r1["twap_e4"] == (100 * num) // (24 * us)
    # the 1-minute spike moved the day mean by < 0.02 of a unit
    assert abs(r1["twap_e4"] - 10_0139) < 150
    r2 = got[2]
    assert r2["den_us"] == 16 * us and r2["twap_e4"] == 50_0000

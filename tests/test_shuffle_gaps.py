from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.operators.relational import key_gaps
from big_data_validator_spark.operators.sampling import (
    shuffle_shard_stats,
    shuffle_shards,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- shuffle


def test_shuffle_is_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = shuffle_shards(df, "k", n_shards=8).orderBy("k").collect()
    b = (
        shuffle_shards(df.repartition(7), "k", n_shards=8)
        .orderBy("k")
        .collect()
    )
    assert a == b
    shards = {r["shard_id"] for r in a}
    assert shards <= set(range(8)) and len(shards) == 8


def test_shuffle_seed_changes_order(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "k")
    a = [
        r["k"]
        for r in shuffle_shards(df, "k", 4, seed=1)
        .orderBy("_shuffle_rank")
        .collect()
    ]
    b = [
        r["k"]
        for r in shuffle_shards(df, "k", 4, seed=2)
        .orderBy("_shuffle_rank")
        .collect()
    ]
    assert a != b and sorted(a) == sorted(b)


def test_shuffle_rank_order_not_correlated_with_key_order(spark):
    """The point of the shuffle: rank order must scramble source order.
    Spearman-ish check: the first 10% of ranks must not be the first
    10% of keys."""
    n = 1000
    df = spark.range(0, n).withColumnRenamed("id", "k")
    first_decile = [
        r["k"]
        for r in shuffle_shards(df, "k", 4)
        .orderBy("_shuffle_rank")
        .limit(n // 10)
        .collect()
    ]
    assert max(first_decile) > n // 2  # scrambled, not a prefix


def test_shard_stats_match_manual(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("sz")
    )
    sharded = shuffle_shards(df, "k", n_shards=4)
    stats = {
        r["shard_id"]: r
        for r in shuffle_shard_stats(sharded, "k", "sz").collect()
    }
    rows = sharded.collect()
    for sid, srow in stats.items():
        members = [r for r in rows if r["shard_id"] == sid]
        members.sort(key=lambda r: r["_shuffle_rank"])
        assert srow["n_rows"] == len(members)
        assert srow["sum_size"] == sum(r["sz"] for r in members)
        assert srow["first_key"] == members[0]["k"]
        assert srow["last_key"] == members[-1]["k"]


def test_shuffle_invalid_shards_raise(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        shuffle_shards(df, "k", 0)


# ---------------------------------------------------------------- key gaps


def _gaps_brute(keys):
    ks = sorted(set(keys))
    out = []
    for a, b in zip(ks, ks[1:]):
        if b - a > 1:
            out.append((a + 1, b - 1, b - a - 1))
    return out


@pytest.mark.parametrize("block_size", [2, 7, 1 << 20])
def test_key_gaps_match_brute_force_across_block_sizes(spark, block_size):
    keys = [0, 1, 2, 5, 6, 40, 41, 100, 300, 301, 302, 1000]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        tuple(r)
        for r in key_gaps(df, "k", block_size=block_size).collect()
    )
    assert got == _gaps_brute(keys)


def test_key_gaps_handles_duplicates_nulls_empty(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (3,), (None,)], "k long"
    )
    got = sorted(tuple(r) for r in key_gaps(df, "k").collect())
    assert got == [(2, 2, 1)]
    empty = spark.createDataFrame([], "k long")
    assert key_gaps(empty, "k").count() == 0
    with pytest.raises(ValueError):
        key_gaps(df, "k", block_size=1)


def test_registry_entries_match_duckdb(spark):
    from big_data_validator_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in ("orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name in ("train_shuffle_shards", "rule_key_gaps"):
        spec = REGISTRY[name]
        got = sorted(tuple(r) for r in spec.fn(spark, SF_DIR).collect())
        want = sorted(
            tuple(r) for r in con.execute(spec.oracle).fetchall()
        )
        assert got == want, name
        assert len(got) > 0, name


def test_shuffle_shards_rejects_null_keys(spark):
    """ADVICE r5: concat_ws would silently drop a NULL key and every
    such row would collide on the identical rank md5(seed); the rank
    expression now raises instead."""
    df = spark.createDataFrame([(1,), (None,)], "k long")
    with pytest.raises(Exception, match="NULL in key column"):
        shuffle_shards(df, "k", n_shards=2).collect()

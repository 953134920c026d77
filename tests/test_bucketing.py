"""Bucketed-layout pins: the ingest-time shuffle is paid once — the
downstream join and aggregation plans must contain NO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.operators.bucketing import (
    bucketed_join,
    read_bucketed,
    write_bucketed,
)
from big_data_validator_spark.plans.inspect import executed_plan, shuffle_count

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed_wh")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(
        orders, "bdv_orders_b", "o_orderkey", 8, sort_cols="o_orderkey",
        path=str(warehouse / "orders_b"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bdv_lineitem_b",
        "o_orderkey",
        8,
        sort_cols="o_orderkey",
        path=str(warehouse / "lineitem_b"),
    )
    yield "bdv_orders_b", "bdv_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bdv_orders_b")
    spark.sql("DROP TABLE IF EXISTS bdv_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # at sf0.001 the planner rightly prefers broadcast (which bypasses
    # bucketing); disable it to exercise the shuffle join these tables
    # would get at fact-fact scale — the scenario bucketing exists for
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        plan = executed_plan(joined)
        assert shuffle_count(joined) == 0, plan
        assert "SortMergeJoin" in plan, plan
        # the scans read the bucket layout directly
        assert plan.count("Bucketed: true") == 2, plan
        # (Sort nodes remain: Spark only trusts sortBy metadata when each
        # bucket is a single file — the Exchange elimination is the win
        # that scales; sorting is partition-local and spill-safe)
        # sanity: the join result is correct vs the plain-parquet join
        plain = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = (
        read_bucketed(spark, left)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    assert shuffle_count(agg) == 0, executed_plan(agg)


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join off plain parquet carries Exchanges, so the
    zero above is the bucket spec at work, not a planner accident."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    joined = orders.hint("merge").join(lineitem, "o_orderkey")
    assert shuffle_count(joined) >= 1

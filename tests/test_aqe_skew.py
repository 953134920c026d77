"""AQE skew-join pin: the README claims AQE handles skewed joins at
runtime — this proves the skew split actually fires on a deliberately
skewed join, instead of leaving the claim as configuration folklore.

AQE's skew thresholds default to cluster scale (256 MB partitions); the
test lowers them so a local fixture exhibits the same behavior a hot key
shows at 100 TB: the skewed partition is split into multiple tasks
instead of one straggler.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # flag partitions ~5x the advisory size as skewed, at tiny absolute
    # sizes so local data qualifies
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    prev = {}
    for k, v in SKEW_CONFS.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is not None:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs, tmp_path):
    # 95% of fact rows share ONE key — the classic hot-key join.  Written
    # to parquet so sizes are realistic for the byte-based thresholds.
    fact = spark.range(0, 60_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload-padding-"), F.col("id").cast("string")).alias("v"),
    )
    dim = spark.range(0, 60_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim"))

    joined = f.join(d.hint("merge"), "k")
    # AQE decides at runtime — materialize THIS DataFrame's own query
    # execution (count() would plan a separate aggregate query), then
    # read the finalized plan
    assert len(joined.collect()) == 60_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    # the skew handling markers: the SMJ is tagged and the shuffle read
    # carries skewed splits
    assert "skew=true" in plan or "skewed" in plan.lower(), plan
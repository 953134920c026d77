"""GROUPED_AGG pandas UDAF: positional trimmed mean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.functions.udafs import trimmed_mean


def test_trimmed_mean_positional_semantics(spark):
    # group a: values 0..9 → drop 1 low + 1 high → mean(1..8) = 4.5
    # group b: 3 values, floor(3*0.1)=0 → plain mean
    rows = [("a", float(i)) for i in range(10)] + [
        ("b", 1.0), ("b", 2.0), ("b", 9.0)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: r["tm"]
        for r in df.groupBy("g").agg(trimmed_mean("v", 0.1).alias("tm")).collect()
    }
    assert got["a"] == pytest.approx(4.5)
    assert got["b"] == pytest.approx(4.0)


def test_trimmed_mean_null_and_validation(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 5.0)], ["g", "v"]
    )
    got = df.groupBy("g").agg(trimmed_mean("v").alias("tm")).collect()
    assert got[0]["tm"] == pytest.approx(5.0)  # nulls dropped before trim
    with pytest.raises(ValueError):
        trimmed_mean("v", 0.5)

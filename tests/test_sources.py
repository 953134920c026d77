"""Columnar source round-trips beyond parquet: ORC keeps the same
pushdown/pruning surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_validator_spark.plans.inspect import (
    pushed_filters,
    read_schema_columns,
)
from big_data_validator_spark.sources.readers import (
    scan_orc,
    scan_parquet_evolving,
)

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orc_path = str(tmp_path / "orders_orc")
    src.write.orc(orc_path)

    back = scan_orc(spark, orc_path)
    assert back.count() == src.count()
    # data round-trips exactly
    assert src.exceptAll(back).count() == 0

    q = back.filter(F.col("o_totalprice") > 100_000.0).select(
        "o_orderkey", "o_totalprice"
    )
    pushed = pushed_filters(q)
    assert any("o_totalprice" in p for p in pushed), pushed
    cols = read_schema_columns(q)
    assert set(cols) == {"o_orderkey", "o_totalprice"}


def test_parquet_schema_evolution_merges(spark, tmp_path):
    """Files written before a column existed must surface it as null —
    and the default single-footer read demonstrably loses the column."""
    old = str(tmp_path / "d1")
    new = str(tmp_path / "d2")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "v", "score"]
    ).write.parquet(new)

    merged = scan_parquet_evolving(spark, old, new)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_partition_filter_prunes_directories(spark, tmp_path):
    """The partition predicate must land in PartitionFilters (directory
    pruning at listing time), NOT as a data filter — and only matching
    partitions' files may be read."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "orders_part")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters:")[1].split(
        "]"
    )[0]
    # inputFiles() reflects the PRE-pruning listing; what matters is the
    # files actually read at execution time
    files = [
        r[0]
        for r in back.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "scan read no files"
    assert all(
        "o_orderpriority=1-URGENT" in f or "o_orderpriority=2-HIGH" in f
        for f in files
    ), files[:3]


def test_unpivot_roundtrips_wide_frame(spark):
    wide = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], "k string, x double, y double"
    )
    long = wide.unpivot(
        ids=["k"],
        values=["x", "y"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    got = sorted(tuple(r) for r in long.collect())
    assert got == [
        ("a", "x", 1.0),
        ("a", "y", 2.0),
        ("b", "x", 3.0),
        ("b", "y", 4.0),
    ]


def test_registry_entries_match_duckdb(spark):
    from big_data_validator_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name in (
        "agg_correlation_matrix",
        "scan_unpivot_metrics",
        "scan_partition_pruned",
    ):
        spec = REGISTRY[name]
        got = sorted(tuple(r) for r in spec.fn(spark, SF_DIR).collect())
        want = sorted(
            tuple(r) for r in con.execute(spec.oracle).fetchall()
        )
        assert got == want, name
        assert len(got) > 0, name

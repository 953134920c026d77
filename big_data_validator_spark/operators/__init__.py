"""Validation rules and data-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism when the input
    arrives in fewer partitions than cores.

    Compute-bound operators (shingling, signature kernels, per-row regex
    batteries) inherit the SCAN's partitioning — a small parquet file comes
    in as one partition and the whole pipeline runs on one core (measured:
    the sf0.1 documents table is a single file; MinHash ran 1/32 cores).
    At 100 TB scans are already thousands of partitions and this is a
    no-op; the guard uses Catalyst's size estimate (driver-side, free —
    probing ``df.rdd.getNumPartitions()`` would cost an RDD conversion and
    a file-listing job per call), so only inputs small enough to have been
    read as fewer splits than cores ever get the extra exchange."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        est_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    # One split per core at the default 128 MiB maxPartitionBytes: inputs
    # under this arrive under-parallelized; above it Spark already splits.
    if est_bytes < target * (128 << 20):
        return df.repartition(target)
    return df

"""Bucketed-table layout: pre-shuffled, co-located storage for the joins
and aggregations a pipeline repeats every run.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
corpus ⋈ pair-candidates, …) is the shuffle of both sides.  Writing the
tables bucketed by the join key — ``df.write.bucketBy(n, key)`` — pays
that shuffle ONCE at ingest; every later join or aggregation on the key
reads co-located buckets and plans with **no Exchange on either side**
(pinned by ``tests/test_bucketing.py``).  This is Spark's storage-level
answer to the reference's single-node "everything is local" assumption,
and the right layout for validation pipelines that re-validate the same
tables daily.

Bucketing rules that matter at scale (encoded in the helpers):

- both sides must use the SAME bucket count (or an integer multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) on the SAME key;
- bucket count should target post-compression bucket files of
  ~100-200 MiB — thousands of buckets at 100 TB;
- ``sortBy`` within buckets lets the join skip its Sort nodes too, but
  only when each bucket lands in a single file (Spark distrusts the sort
  metadata otherwise) — coalesce before writing if that matters;
- bucketed tables go through the session catalog (``saveAsTable``) —
  plain ``parquet(path)`` writes drop the bucket spec.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Union[str, Sequence[str]],
    num_buckets: int,
    sort_cols: Optional[Union[str, Sequence[str]]] = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: Optional[str] = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted) table.

    The write itself shuffles on ``bucket_cols`` — that is the point: the
    shuffle is paid here, once, instead of inside every downstream join.
    ``path`` creates an EXTERNAL table at that location (the warehouse
    dir is a static config, fixed at session start — per-dataset
    locations must come through the table definition instead).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.format(fmt).mode(mode).bucketBy(num_buckets, cols[0], *cols[1:])
    )
    if sort_cols is not None:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(scols[0], *scols[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a catalog
    read — ``spark.read.parquet`` on the files would lose the spec)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Union[str, Sequence[str]],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    With matching bucket specs this plans a SortMergeJoin with NO
    Exchange on either side (and no Sort if both were ``sortBy`` the
    key): each task reads bucket *i* of both tables.  At 1000 executors
    that is the difference between a full network shuffle of both fact
    tables and a purely local merge.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), keys, how
    )

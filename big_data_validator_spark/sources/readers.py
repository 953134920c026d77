"""Parquet / JSON / ORC scans.

The reference's reader has an enum-comment placeholder for "CSV, Parquet or
JSON" (``big_data_validator.py:134``) but only implements CSV; these
complete the intent (plus ORC, the other columnar format Spark ships
natively).  All readers keep Catalyst's pushdown surface intact:
callers should ``.select`` the columns they need and ``.filter`` early so
the scan prunes columns and row groups / stripes (verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from big_data_validator_spark.contract import CORRUPT_RECORD_COL


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan.  Schema comes from the footer; filters and projections
    push down to row-group / page level for free."""
    return spark.read.parquet(path)


def scan_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan across files written under an EVOLVING schema
    (columns added over time): ``mergeSchema`` unions the footers'
    schemas, older files surface the new columns as nulls.

    Ingests that append daily drops hit this constantly; the default
    reader picks one footer and silently DROPS later columns.  Merging
    costs a footer read per file at planning — at 100 TB prefer a table
    format or explicit schema, but for raw directory ingest this is the
    correct behavior, and validation rules (completeness etc.) then see
    the union schema.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def scan_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — native Spark format, same pushdown properties as
    parquet (predicate → stripe/row-index skipping, column pruning)."""
    return spark.read.orc(path)


def scan_json(
    spark: SparkSession,
    path: str,
    schema: Optional[StructType] = None,
) -> DataFrame:
    """JSON-lines scan with the same PERMISSIVE corrupt-record contract as
    the CSV scan.  An explicit schema avoids the inference pre-pass (a full
    extra scan at 100 TB) — always pass one in production."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_RECORD_COL)
    )
    if schema is not None:
        if CORRUPT_RECORD_COL not in schema.fieldNames():
            schema = schema.add(CORRUPT_RECORD_COL, "string", True)
        reader = reader.schema(schema)
    return reader.json(path)

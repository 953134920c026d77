"""CSV / raw-text source scans.

Reference behavior re-expressed Spark-first:

- the reference scans the file twice, once as ``sc.textFile`` (RDD of lines,
  ``big_data_validator.py:262``) and once through the CSV reader
  (``:135-146``).  We keep both *views* but both are DataFrames — the line
  view is ``spark.read.text`` so per-line rules stay inside Catalyst /
  whole-stage codegen instead of Python lambdas.
- PERMISSIVE mode + ``columnNameOfCorruptRecord`` capture is kept verbatim;
  it is already idiomatic Spark.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from big_data_validator_spark.contract import CORRUPT_RECORD_COL, TableContract


def scan_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file scan as raw lines, one ``value: string`` column.

    DataFrame equivalent of the reference's ``sc.textFile``
    (``big_data_validator.py:262``) — unlike the RDD, downstream splits /
    regex counts compile to codegen'd expressions.  At 100 TB this scan is
    automatically split by file and by HDFS/S3 block, so parallelism scales
    with input size; ``wholetext`` is never used.
    """
    return spark.read.text(path)


def probe_header(
    spark: SparkSession, path: str, contract: TableContract
) -> list[str]:
    """Read the first line and derive the actual column list.

    Semantics of ``big_data_validator.py:39-47``: split the header on the
    field separator, strip the (raw, possibly multi-char) string-separator
    character set from each cell, uppercase.  ``str.strip(chars)`` treats its
    argument as a character *set*, so the reference's 4-char ``\"\"\"\"``
    separator strips the same characters a single quote would — preserved by
    stripping the normalized set.

    This is a one-partition, first-line-only job (``limit(1)``) — constant
    cost regardless of table size.
    """
    first = spark.read.text(path).limit(1).collect()
    if not first:
        return []
    line = first[0][0]
    cells = line.split(contract.field_separator)
    strip_chars = contract.string_separator or ""
    return [c.strip(strip_chars).upper() for c in cells]


def scan_csv_permissive(
    spark: SparkSession,
    path: str,
    contract: TableContract,
    actual_columns: Optional[Iterable[str]] = None,
) -> DataFrame:
    """Quote/escape-aware CSV scan with corrupt-record capture.

    Options match the reference reader (``big_data_validator.py:135-146``):
    explicit all-string schema, header row, multiline quoted fields,
    leading/trailing whitespace trim, PERMISSIVE mode with unparseable rows
    captured in ``CorruptRecCol`` instead of failing the job.

    The reference couples this to a hidden ordering dependency — the schema
    comes from ``self.actual_columns`` set by the column-name rule
    (SURVEY.md §7 hard-list item 4).  Here the dependency is an explicit
    parameter; when omitted the header is probed directly.
    """
    if actual_columns is None:
        actual_columns = probe_header(spark, path, contract)
    schema = contract.read_schema(actual_columns)

    reader = (
        spark.read.option("header", "true")
        .option("delimiter", contract.field_separator)
        .option("enforceSchema", "false")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("multiLine", True)
        .option("columnNameOfCorruptRecord", CORRUPT_RECORD_COL)
        .option("mode", "PERMISSIVE")
    )
    if contract.quote_char is not None:
        reader = reader.option("quote", contract.quote_char).option(
            "escape", contract.escape_char
        )
    return reader.schema(schema).csv(path)

"""pyspark-data-validator: a PySpark-native data-quality validation engine.

A from-scratch rebuild of the capabilities of ``fs63090/big-data-validator``
(surveyed in SURVEY.md) as an idiomatic Spark library:

- :mod:`~big_data_validator_spark.contract`   — metadata schema contracts
  (the reference's semicolon-CSV descriptor format).
- :mod:`~big_data_validator_spark.sources`    — permissive CSV / text /
  parquet / json scans with corrupt-record capture.
- :mod:`~big_data_validator_spark.operators`  — validation rules compiled to
  Catalyst ``Column`` expressions (reference parity + generalized relational
  rules), plus LLM-data-pipeline operators (dedup, similarity, text
  analysis, multimodal plumbing).
- :mod:`~big_data_validator_spark.runner`     — single-pass rule evaluation
  with a partitioned Parquet failure sink.
- :mod:`~big_data_validator_spark.streaming`  — the same rules over
  Structured Streaming with watermarks.

Design rules (100 TB headroom): no ``collect()`` on data paths, one metrics
pass per table (not one job per rule like the reference), broadcast-hinted
dimension joins, approximate sketches for cardinality, partitioned sinks.
"""

from big_data_validator_spark.contract import (
    ColumnSpec,
    TableContract,
    suggest_contract,
)
from big_data_validator_spark.report import RuleResult, ValidationReport
from big_data_validator_spark.runner import ValidationRunner

__all__ = [
    "ColumnSpec",
    "TableContract",
    "suggest_contract",
    "RuleResult",
    "ValidationReport",
    "ValidationRunner",
]

__version__ = "0.1.0"

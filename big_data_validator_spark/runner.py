"""Validation runner: contract → rules → single-pass metrics → failure sink.

End-to-end equivalent of the reference CLI
(``spark-submit big_data_validator.py <TABLE>`` →
``BigDataValidator.validation_main``, ``big_data_validator.py:283-297``),
re-planned for Spark:

reference physical plan (per SURVEY.md §3): up to ~5 separate jobs, each
rescanning the file — ``first()`` for the header, a full RDD ``count()``
through a Python lambda for the field-count rule, then on mismatch a CSV
read + ``head(1)`` + parquet write.

this runner: one one-row header probe, then ONE metrics job over the line
scan (all line-level counters in a single ``agg``), and only on mismatch a
CSV-parser escalation (one read feeding both the verdict and the failure
sink).  No RDDs, no Python row lambdas, nothing collected but scalar
counters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_validator_spark.contract import TableContract
from big_data_validator_spark.operators import rules as R
from big_data_validator_spark.operators.typed import contract_violation_exprs
from big_data_validator_spark.report import RuleResult, ValidationReport
from big_data_validator_spark.sinks import default_failure_path, write_failures_parquet
from big_data_validator_spark.sources.csv_source import (
    probe_header,
    scan_csv_permissive,
    scan_text_lines,
)


@dataclass
class RunnerConfig:
    enforce_types: bool = True  # SURVEY §7 P2 (reference declares, never checks)
    write_failures: bool = True
    failure_base_dir: Optional[str] = None  # default: alongside the input
    # 100 TB sink hygiene (SURVEY §4): partition the failure sink by these
    # contract columns (e.g. a date column) so downstream triage prunes
    # partitions instead of scanning every failure ever written.  Columns
    # not present in the failing rows are ignored rather than erroring —
    # the sink must never be the reason a validation run dies.
    failure_partition_by: Optional[tuple[str, ...]] = None


class ValidationRunner:
    """Runs a contract's rules against one delimited-text table."""

    def __init__(self, spark: SparkSession, config: Optional[RunnerConfig] = None):
        self.spark = spark
        self.config = config or RunnerConfig()

    # ------------------------------------------------------------------ API

    def validate_csv(
        self, table: str, csv_path: str, contract: TableContract
    ) -> ValidationReport:
        report = ValidationReport(table=table)

        # 1. header probe (one-row job) + column-name rule (driver-side).
        actual_columns = probe_header(self.spark, csv_path, contract)
        name_result = R.rule_column_names(actual_columns, contract)
        report.add(name_result)

        # 2. line-level field-count rule: ONE aggregation job.
        #    The reference counts the header line too (its RDD includes it,
        #    big_data_validator.py:191) — the header has the actual arity by
        #    construction, so we preserve behavior by comparing against the
        #    actual header arity, not the contract arity.
        lines = scan_text_lines(self.spark, csv_path)
        mismatch = R.field_count_violation_expr(
            F.col("value"), contract, expected_arity=len(actual_columns)
        )
        [n_lines, n_mismatch] = (
            lines.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(mismatch.cast("long")).alias("bad"),
            ).first()
        )
        count_rule = "field_count_quoted" if contract.string_separator else "field_count_naive"
        line_result = RuleResult(
            rule=count_rule,
            passed=(n_mismatch or 0) == 0,
            violation_count=int(n_mismatch or 0),
            details={"lines": n_lines, "expected_arity": len(actual_columns)},
        )

        table_df: Optional[DataFrame] = None
        if not line_result.passed:
            # 3. escalation: the raw line count is quote/newline-blind, so
            #    defer to the full CSV parser (reference fallback,
            #    big_data_validator.py:198-205).
            table_df = scan_csv_permissive(
                self.spark, csv_path, contract, actual_columns
            )
            verdict, bad = R.rule_csv_parser_verdict(table_df)
            if verdict.passed:
                line_result = RuleResult(
                    rule=count_rule,
                    passed=True,
                    violation_count=0,
                    details={**line_result.details, "escalated": True},
                )
            else:
                line_result.details["escalated"] = True
                try:
                    if self.config.write_failures:
                        sink = default_failure_path(
                            self.config.failure_base_dir
                            or csv_path.rsplit("/", 1)[0],
                            table,
                        )
                        part_cols = [
                            c
                            for c in (self.config.failure_partition_by or ())
                            if c in bad.columns
                        ]
                        write_failures_parquet(
                            bad, sink, partition_by=part_cols or None
                        )
                        report.failure_sink_path = sink
                finally:
                    bad.unpersist()
        report.add(line_result)

        # 4. declared-type enforcement (P2) — single agg over the parsed
        #    table, all columns at once.  Only meaningful if the names rule
        #    passed (columns must exist).
        if self.config.enforce_types and name_result.passed and contract.columns:
            if table_df is None:
                table_df = scan_csv_permissive(
                    self.spark, csv_path, contract, actual_columns
                )
            report.add(self._type_enforcement_result(table_df, contract))

        return report

    def validate_dataframe(
        self, table: str, df: DataFrame, contract: TableContract
    ) -> ValidationReport:
        """Validate an already-parsed DataFrame (parquet/json path): name
        conformance + declared-type enforcement; no line-level rules."""
        report = ValidationReport(table=table)
        name_result = R.rule_column_names(df.columns, contract)
        report.add(name_result)
        if self.config.enforce_types and name_result.passed and contract.columns:
            report.add(self._type_enforcement_result(df, contract))
        return report

    # ------------------------------------------------------------- internal

    def _type_enforcement_result(
        self, df: DataFrame, contract: TableContract
    ) -> RuleResult:
        # Case-insensitive column resolution (spark.sql.caseSensitive=false
        # by default) lets contract names hit actual columns like the
        # reference's uppercase matching.
        exprs = contract_violation_exprs(contract)
        string_cols = {c.upper() for c in df.columns}
        aggs = [
            F.sum(expr.cast("long")).alias(name)
            for name, expr in exprs.items()
            if name.upper() in string_cols
        ]
        if not aggs:
            return RuleResult(rule="type_enforcement", passed=True)
        row = df.agg(*aggs).first().asDict()
        per_col = {k: int(v or 0) for k, v in row.items()}
        total = sum(per_col.values())
        return RuleResult(
            rule="type_enforcement",
            passed=total == 0,
            violation_count=total,
            details={"per_column": per_col},
        )

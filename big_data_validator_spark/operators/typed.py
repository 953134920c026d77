"""Declared-type / format / nullability enforcement.

The reference *declares* ``SourceDataType`` / ``SourceDataFormat`` /
``SourceNullable`` in its metadata (``metadata_csv_to_json.py:33-37``) but
never reads them back in any validation path (grep-verified, SURVEY.md §1).
This module completes that declared-but-unimplemented contract (SURVEY.md §7
P2): every declaration compiles to one boolean violation expression, and all
columns' checks run in the same single aggregation pass.

All casts use ``try_``-style expressions so the checks behave identically
under ANSI mode (Spark 4 default) — a failed parse yields NULL, which is the
violation signal, instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from big_data_validator_spark.contract import ColumnSpec, TableContract
from big_data_validator_spark.functions.exprs import regex_literal


def number_violation(col: Column, decimal_separator: str = ".") -> Column:
    """Non-null value that does not parse as a number (honoring the
    contract's ``DecimalSeparator``)."""
    s = F.trim(col)
    if decimal_separator and decimal_separator != ".":
        s = F.regexp_replace(s, regex_literal(decimal_separator), ".")
    return col.isNotNull() & (F.trim(col) != "") & s.try_cast("double").isNull()


def date_violation(col: Column, fmt: str) -> Column:
    """Non-null value that does not parse with the declared date format
    (e.g. ``dd/MM/yyyy``, as in the reference's shipped contract)."""
    parsed = F.try_to_timestamp(col, F.lit(fmt)) if fmt else F.try_to_timestamp(col)
    return col.isNotNull() & (F.trim(col) != "") & parsed.isNull()


def not_null_violation(col: Column) -> Column:
    """NULL (or empty-string, which is what NULL looks like in delimited
    text) in a column declared ``NULLABLE=FALSE``."""
    return col.isNull() | (F.trim(col) == "")


def column_violation_expr(spec: ColumnSpec, contract: TableContract) -> Column:
    """Combined violation expression for one column's declarations."""
    col = F.col(spec.name)
    checks: list[Column] = []
    if not spec.nullable:
        checks.append(not_null_violation(col))
    if spec.source_type.upper() == "NUMBER":
        checks.append(number_violation(col, contract.decimal_separator))
    elif spec.source_type.upper() == "DATE":
        checks.append(date_violation(col, spec.source_format))
    if not checks:
        return F.lit(False)
    out = checks[0]
    for c in checks[1:]:
        out = out | c
    return out


def contract_violation_exprs(contract: TableContract) -> dict[str, Column]:
    """Violation expression per contract column, keyed by column name.
    The runner sums these in ONE ``agg`` pass — not one job per column."""
    return {
        spec.name: column_violation_expr(spec, contract)
        for spec in contract.columns
    }

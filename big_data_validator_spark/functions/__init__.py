"""Shared Column-expression builders (JVM-side, codegen-friendly)."""

from big_data_validator_spark.functions.exprs import (
    cosine_similarity,
    field_count_naive,
    field_count_quoted,
    quoted_field_count_regex,
    regex_literal,
)

__all__ = [
    "cosine_similarity",
    "field_count_naive",
    "field_count_quoted",
    "quoted_field_count_regex",
    "regex_literal",
]

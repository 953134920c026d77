"""Column-expression builders shared across operators.

Everything here produces pure Catalyst expressions — no Python UDFs — so
rule evaluation stays inside whole-stage codegen.  The reference computes
the same quantities with Python lambdas over RDDs
(``big_data_validator.py:191,240``), paying a per-row JVM↔Python round trip;
these expressions are the Spark-first replacement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Characters with special meaning inside a Java regex (outside char class).
_REGEX_SPECIALS = set("\\^$.|?*+()[]{}")


def regex_literal(s: str) -> str:
    """Escape a literal string for embedding in a Java regex.

    The reference escapes only ``|`` (TODO'd at
    ``big_data_validator.py:229-234``); this is the completed version.
    Backslash-escaping every special is portable between Java regex (Spark)
    and Python ``re``, unlike ``\\Q...\\E`` which Python lacks.
    """
    return "".join("\\" + c if c in _REGEX_SPECIALS else c for c in s)


def field_count_naive(line: Column, field_separator: str) -> Column:
    """Quote-blind per-line field count: ``len(line.split(sep))``.

    Expression form of the reference's RDD lambda at
    ``big_data_validator.py:191``.  ``F.split`` takes a regex, so the
    literal separator is escaped; limit ``-1`` keeps trailing empty fields
    exactly like Python's ``str.split``.
    """
    return F.size(F.split(line, regex_literal(field_separator), -1))


def quoted_field_count_regex(field_separator: str, quote_char: str = '"') -> str:
    """Regex whose match count over a line equals its quote-aware field
    count.

    Same pattern family as the reference (``big_data_validator.py:221``,
    credited there to a Stack Overflow answer on splitting outside quoted
    strings): a field is a run of non-separator/non-quote chars and/or
    quoted spans (a quote, non-quote chars, then a closing quote or end of
    line — tolerating unbalanced quotes); zero-width lookaheads count the
    empty fields produced by adjacent, leading, or trailing separators.
    """
    sep = regex_literal(field_separator)
    quote = regex_literal(quote_char)
    return (
        f"(?:(?:[^{sep}{quote}]|{quote}[^{quote}]*(?:{quote}|$))+"
        f"|(?={sep}{sep})|(?={sep}$)|(?=^{sep}))"
    )


def field_count_quoted(
    line: Column, field_separator: str, quote_char: str = '"'
) -> Column:
    """Quote-aware per-line field count via ``regexp_count``.

    Expression form of the reference's ``re.findall`` lambda
    (``big_data_validator.py:240``).  Java's ``Matcher.find`` loop and
    Python's ``findall`` agree on this pattern (both advance one char past
    zero-width matches); parity is pinned by tests against ``re.findall``
    on the nasty-quoting fixtures.
    """
    return F.regexp_count(line, F.lit(quoted_field_count_regex(field_separator, quote_char)))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<numeric>`` columns, JVM-side.

    Built from ``zip_with`` + ``aggregate`` higher-order functions, so it
    runs inside codegen with no Python involvement — the scale path for
    embedding similarity at 100 TB (SURVEY.md §2g).  Returns NULL if either
    vector has zero norm.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    denom = norm_a * norm_b
    return F.when(denom != 0.0, dot / denom)

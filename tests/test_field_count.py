"""Parity of the codegen field-count expressions with the reference's
Python-``re``/``str.split`` semantics, on the nasty-quoting fixture lines."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.functions.exprs import (
    field_count_naive,
    field_count_quoted,
    quoted_field_count_regex,
)

LINES = [
    '"ID"|"NAME"|"SURNAME"|"BIRTH_DATE"',
    '"1001"|"Ada"|"Lovelace"|"10/12/1815"',
    # unbalanced quote: naive split sees 5 fields, quote-aware sees 4
    '"1002"|"Patricia A. (Patricia Ann)"|"Turner|"23/1/2002"',
    "a|b|c|d",
    "a||c|d",          # empty middle field
    "|b|c|d",          # empty leading field
    "a|b|c|",          # empty trailing field
    "a|b||",           # adjacent empty trailing fields
    "",                # empty line
    '"x|y"|b|c|d',     # separator inside quotes
]


def python_findall_count(line: str, sep: str = "|", quote: str = '"') -> int:
    """The reference's counting method (``big_data_validator.py:221-240``):
    len(re.findall) over the quoted-field pattern."""
    pattern = quoted_field_count_regex(sep, quote)
    return len(re.findall(pattern, line))


def test_quoted_count_matches_python_re(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["value"])
    got = [
        r[0]
        for r in df.select(
            field_count_quoted(F.col("value"), "|", '"')
        ).collect()
    ]
    expected = [python_findall_count(l) for l in LINES]
    assert got == expected


def test_naive_count_matches_str_split(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["value"])
    got = [
        r[0]
        for r in df.select(field_count_naive(F.col("value"), "|")).collect()
    ]
    expected = [len(l.split("|")) for l in LINES]
    assert got == expected


def test_quoted_count_well_formed_lines():
    assert python_findall_count('"a"|"b"|"c"|"d"') == 4
    # the unbalanced quote makes the regex glue the last two fields into one
    # (count 3 ≠ arity 4) — this mismatch is exactly what makes the
    # reference escalate to the Spark CSV reader on its own fixture.
    assert (
        python_findall_count('"1002"|"Patricia A. (Patricia Ann)"|"Turner|"23/1/2002"')
        == 3
    )


@pytest.mark.parametrize(
    "line,sep,expected",
    [("a,b,c", ",", 3), ("a;b;;", ";", 4), ("a\tb", "\t", 2)],
)
def test_naive_count_other_separators(spark, line, sep, expected):
    df = spark.createDataFrame([(line,)], ["value"])
    assert df.select(field_count_naive(F.col("value"), sep)).first()[0] == expected


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # adversarial alphabet: separators, quotes, and plain chars in any order
    line_st = st.text(alphabet='ab|" ,x', max_size=40).filter(
        lambda s: "\n" not in s
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(line_st, min_size=1, max_size=20))
    def test_quoted_count_parity_property(spark, lines):
        """SURVEY §7 hard-list item 2: Java-regex (regexp_count) must agree
        with Python ``re.findall`` on the reference's lookahead pattern for
        ARBITRARY quote/separator soup, not just the fixture lines."""
        df = spark.createDataFrame([(l,) for l in lines], ["value"])
        got = [
            r[0]
            for r in df.select(
                field_count_quoted(F.col("value"), "|", '"')
            ).collect()
        ]
        assert got == [python_findall_count(l) for l in lines]
except ImportError:  # pragma: no cover - hypothesis is baked into the env
    pass

"""One-pass table profiling: per-column statistics in a single scan.

The data-validator counterpart of Deequ/Great-Expectations profilers:
row count, null counts, distinct counts, numeric moments, and string
length bounds for every requested column — computed as expression
columns of ONE aggregation, so the table is scanned once regardless of
how many columns are profiled (the same single-pass trick as the rule
metrics in ``operators/relational.py``).

Output is long-format ``(column, metric, value)`` rows — stable schema
no matter which columns are profiled, so sinks/dashboards don't churn.
The wide→long pivot happens on the single aggregate row via ``stack``,
never on data rows.

``exact_distinct=True`` uses ``COUNT(DISTINCT)`` (one extra expand of
the agg, still one scan; oracle-exact).  At 100 TB flip it to
``False`` for HLL ``approx_count_distinct`` — the standard profiling
trade-off.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
_TEMPORAL = {"date", "timestamp", "timestamp_ntz"}


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all non-complex columns) in one
    aggregation pass.  Returns ``(column, metric, value)`` with metrics:

    - every column: ``row_count``, ``null_count``, ``distinct_count``
    - numeric: ``min``, ``max``, ``mean``, ``stddev`` (sample)
    - string: ``min_length``, ``max_length``, ``avg_length``
    - date / timestamp (incl. NTZ): ``min_epoch_s``, ``max_epoch_s`` —
      the bounds as epoch seconds, so freshness/staleness checks read
      straight off the profile (the session timezone is pinned UTC by
      every entry point, making NTZ wall-clock and epoch agree
      cross-engine)

    All values are DOUBLE (metrics are quantitative; string min/max
    VALUES are a top-k question, not a profile metric).  Rounded to 6
    for cross-engine hash stability.
    """
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [
            c for c, t in df.dtypes
            if t in _NUMERIC or t == "string" or t.startswith("decimal")
            or t in _TEMPORAL
        ]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    metrics: list[tuple[str, str]] = []  # (column, metric) in agg order

    def add(col: str, metric: str, expr: Column) -> None:
        aggs.append(expr.alias(f"{col}__{metric}"))
        metrics.append((col, metric))

    for c in columns:
        t = dtypes[c]
        add(c, "null_count", F.sum(F.col(c).isNull().cast("long")).cast("double"))
        distinct = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        add(c, "distinct_count", distinct.cast("double"))
        if t in _NUMERIC or t.startswith("decimal"):
            add(c, "min", F.min(c).cast("double"))
            add(c, "max", F.max(c).cast("double"))
            add(c, "mean", F.avg(c).cast("double"))
            add(c, "stddev", F.stddev_samp(c).cast("double"))
        elif t == "string":
            add(c, "min_length", F.min(F.length(c)).cast("double"))
            add(c, "max_length", F.max(F.length(c)).cast("double"))
            add(c, "avg_length", F.avg(F.length(c)).cast("double"))
        elif t in _TEMPORAL:
            ep = F.unix_timestamp(F.col(c).cast("timestamp")).cast("double")
            add(c, "min_epoch_s", F.min(ep))
            add(c, "max_epoch_s", F.max(ep))
    wide = df.agg(*aggs)

    # one-row wide → long: explode an array of literal structs (operates
    # on the single aggregate row only); row_count replicates per column
    # so every column's profile is self-contained
    triples: list[tuple[Column, Column, Column]] = [
        (F.lit(c), F.lit(m), F.col(f"{c}__{m}")) for c, m in metrics
    ] + [
        (F.lit(c), F.lit("row_count"), F.col("__rows").cast("double"))
        for c in columns
    ]
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        c.alias("column"),
                        m.alias("metric"),
                        F.round(v, 6).alias("value"),
                    )
                    for c, m, v in triples
                ]
            )
        ).alias("p")
    ).select("p.column", "p.metric", "p.value")

"""Time-series regularization: per-key resampling onto a gapless
calendar spine with forward fill — the "make the feed rectangular"
primitive every monitoring/training pipeline needs before windowed
models (a day with no events must be a ROW saying so, not an absence).

The reference validator has no temporal surface at all (its rules are
row-local; see ``reference/big_data_validator.py``) — this extends the
north-star events family (SURVEY.md §2).

Scale design
------------

- The spine is generated ROW-LOCALLY from a per-key (min_day, max_day)
  aggregate: ``sequence() + explode`` on the k-row bounds frame — never
  a cross join against a global calendar table, never driver-side date
  loops.  Spine size is Σ per-key span, the output's own size.
- One shuffle builds the per-(key, day) aggregate, one equi-join puts
  the spine against it (both sides hash on the same key — AQE plans a
  co-partitioned join), and the forward fill is a running
  ``last(ignorenulls)`` window PARTITIONED BY KEY — bounded by the
  key's span, no global ordering anywhere.
- Determinism: daily aggregation makes (key, day) unique, so the
  forward-filled value is unique regardless of row arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key daily resample of ``events`` with forward fill.

    Returns one row per key per calendar day between that key's first
    and last event day (inclusive):

    - ``n_events`` — events that day (0 on gap days),
    - ``day_value`` — the day's SUM of ``value_col`` (NULL on gaps),
    - ``filled_value`` — ``day_value`` forward-filled from the most
      recent non-gap day (never NULL: day 1 is a data day by
      construction of the per-key bounds),
    - ``is_gap`` — whether the day had no events.

    Rows with NULL key or NULL timestamp are excluded (a keyless or
    timeless event belongs to no series).
    """
    k = F.col(key_col)
    day = F.col(ts_col).cast("date").alias("day")
    daily = (
        events.filter(k.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(k.alias(key_col), day)
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.col(value_col)).alias("_v"),
        )
    )
    bounds = daily.groupBy(key_col).agg(
        F.min("day").alias("_mn"), F.max("day").alias("_mx")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.expr("sequence(_mn, _mx, interval 1 day)")
        ).alias("day"),
    )
    joined = spine.join(daily, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "day",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("_v").alias("day_value"),
        F.last("_v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("_n").isNull().alias("is_gap"),
    )

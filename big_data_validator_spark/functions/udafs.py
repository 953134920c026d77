"""Vectorized Python aggregates (GROUPED_AGG pandas UDAFs).

Spark has no Python UDAF class; the supported form is a
``pandas_udf`` with Series→scalar shape used inside ``groupBy().agg()``.
The engine's policy holds here too: Arrow-batched numpy only, never
row-at-a-time Python, and only for aggregates the built-ins genuinely
cannot express — anything with an SQL/Catalyst formulation stays
JVM-side.

Execution model worth knowing at 100 TB: GROUPED_AGG has **no partial
aggregation** — every group's full value series is shuffled to one task
and materialized in memory (unlike built-in aggregates' map-side
combine).  Right for moderate-cardinality groups with bounded rows per
group; for giant groups, pre-aggregate or sample first.
"""

from __future__ import annotations

import pandas as pd  # module-level: the UDAF's type hints must resolve here
from pyspark.sql import Column
from pyspark.sql import functions as F


def trimmed_mean(col, frac: float = 0.1) -> Column:
    """Positionally trimmed mean: sort the group's values, drop
    ``floor(n·frac)`` from each end, average the rest — the classic
    outlier-robust location estimate for skewed amount-like columns.
    Not expressible with built-in aggregates
    (``percentile``-window formulations trim by VALUE, double-dropping
    ties); the positional semantics need the sorted series.
    """
    if not 0.0 <= frac < 0.5:
        raise ValueError(f"frac must be in [0, 0.5), got {frac}")

    from pyspark.sql.pandas.functions import pandas_udf

    # full type hints (Series -> scalar) are what make this GROUPED_AGG
    @pandas_udf("double")
    def tm(v: pd.Series) -> float:
        import numpy as np

        x = np.sort(v.dropna().to_numpy(dtype=float))
        if len(x) == 0:
            return None
        k = int(len(x) * frac)
        if len(x) - 2 * k > 0:
            x = x[k : len(x) - k]
        return float(x.mean())

    return tm(F.col(col) if isinstance(col, str) else col)

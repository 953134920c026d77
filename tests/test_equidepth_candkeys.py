from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.operators.profile import candidate_key_rule
from big_data_validator_spark.operators.relational import (
    equidepth_histogram,
)


def _brute_equidepth(values, n_bins):
    from collections import Counter

    cnt = Counter(values)
    total = len(values)
    bins = {}
    ce = 0
    for v in sorted(cnt):
        b = min((ce * n_bins) // total, n_bins - 1)
        n = cnt[v]
        ce += n
        row = bins.setdefault(b, [0, v, v])
        row[0] += n
        row[2] = v
    return sorted((b, n, mn, mx) for b, (n, mn, mx) in bins.items())


@pytest.mark.parametrize("block_width", [0.5, 3.0, 1e6])
def test_equidepth_matches_brute_force_any_block_width(spark, block_width):
    values = [float(x) for x in [1, 1, 1, 2, 2, 3, 5, 8, 8, 8, 8, 13, 21]]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = sorted(
        tuple(r)
        for r in equidepth_histogram(
            df, "v", n_bins=4, block_width=block_width
        ).collect()
    )
    assert got == _brute_equidepth(values, 4)


def test_equidepth_skewed_value_stays_in_one_bin(spark):
    # 90% of rows share one value: equi-depth must keep them in ONE bin
    values = [1.0] * 90 + [float(i) for i in range(2, 12)]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    rows = equidepth_histogram(df, "v", 10, 2.0).collect()
    by_bin = {r["bin_id"]: r for r in rows}
    assert by_bin[0]["n_rows"] == 90
    assert by_bin[0]["min_v"] == by_bin[0]["max_v"] == 1.0
    assert sum(r["n_rows"] for r in rows) == len(values)


def test_equidepth_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,)], "v double"
    )
    rows = equidepth_histogram(df, "v", 2, 1.0).collect()
    assert sum(r["n_rows"] for r in rows) == 2
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", 0, 1.0)
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", 2, 0.0)


def test_candidate_key_rule_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "a", None),
            (3, "b", 3.0),
        ],
        "k long, s string, v double",
    )
    got = {r["column"]: r for r in candidate_key_rule(df).collect()}
    assert got["k"]["is_candidate_key"] is True
    assert got["k"]["n_distinct"] == 3 and got["k"]["n_nulls"] == 0
    assert got["s"]["is_candidate_key"] is False  # duplicate
    assert got["v"]["is_candidate_key"] is False  # null
    assert got["v"]["n_nulls"] == 1
    with pytest.raises(ValueError):
        candidate_key_rule(df.select(F.array("k").alias("arr")))


def test_registry_entries_match_duckdb(spark):
    import duckdb

    from big_data_validator_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    for name in ("agg_equidepth_histogram", "rule_candidate_keys"):
        spec = REGISTRY[name]
        got = sorted(tuple(r) for r in spec.fn(spark, sf_dir).collect())
        want = sorted(
            tuple(r) for r in con.execute(spec.oracle).fetchall()
        )
        assert got == want, name
        assert len(got) > 0, name


# ---------------------------------------------------------- chi-square


def test_chi_square_matches_scipy_reference(spark):
    """Hand-checkable 2xk table; expected chi2 from the standard
    contingency formula."""
    from big_data_validator_spark.operators.relational import (
        chi_square_drift,
    )

    a = spark.createDataFrame(
        [("x",)] * 30 + [("y",)] * 10 + [("z",)] * 10, "c string"
    )
    b = spark.createDataFrame(
        [("x",)] * 20 + [("y",)] * 20 + [("w",)] * 10, "c string"
    )
    row = chi_square_drift(a, b, "c").collect()[0]
    # brute-force reference
    from collections import Counter

    ca = Counter(["x"] * 30 + ["y"] * 10 + ["z"] * 10)
    cb = Counter(["x"] * 20 + ["y"] * 20 + ["w"] * 10)
    cats = sorted(set(ca) | set(cb))
    ta, tb = sum(ca.values()), sum(cb.values())
    n = ta + tb
    chi2 = 0.0
    for c in cats:
        p = (ca[c] + cb[c]) / n
        chi2 += (ca[c] - p * ta) ** 2 / (p * ta)
        chi2 += (cb[c] - p * tb) ** 2 / (p * tb)
    assert row["dof"] == len(cats) - 1
    assert row["n_a"] == ta and row["n_b"] == tb
    assert abs(row["chi2"] - chi2) < 1e-6


def test_chi_square_identical_distributions_is_zero(spark):
    from big_data_validator_spark.operators.relational import (
        chi_square_drift,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 5, "c string")
    row = chi_square_drift(a, a, "c").collect()[0]
    assert row["chi2"] == 0.0


def test_chi_square_nulls_excluded(spark):
    from big_data_validator_spark.operators.relational import (
        chi_square_drift,
    )

    a = spark.createDataFrame([("x",), (None,), ("y",)], "c string")
    b = spark.createDataFrame([("x",), ("y",), (None,)], "c string")
    row = chi_square_drift(a, b, "c").collect()[0]
    assert row["n_a"] == 2 and row["n_b"] == 2


def test_chi_square_registry_matches_duckdb(spark):
    import duckdb

    from big_data_validator_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    spec = REGISTRY["drift_chi2_priority"]
    got = sorted(tuple(r) for r in spec.fn(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
    assert len(got) == 1


def test_chi_square_empty_snapshot_returns_null_chi2(spark):
    """ADVICE r5: an empty/new snapshot is a normal drift-monitor input;
    under Spark 4 ANSI the zero expected counts used to raise
    DIVIDE_BY_ZERO.  Now: defined row, NULL chi2, totals populated."""
    from big_data_validator_spark.operators.relational import (
        chi_square_drift,
    )

    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "c string")
    empty = spark.createDataFrame([], "c string")
    row = chi_square_drift(a, empty, "c").collect()[0]
    assert row["chi2"] is None
    assert row["n_a"] == 5 and row["n_b"] == 0
    assert row["dof"] == 1  # two categories present overall
    row2 = chi_square_drift(empty, a, "c").collect()[0]
    assert row2["chi2"] is None and row2["n_a"] == 0 and row2["n_b"] == 5

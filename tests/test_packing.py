"""Sequence packing + mixture planning: exact semantics vs a naive
in-Python reference, and the plan-shape guarantee that no row-bearing
window runs unpartitioned (the whole point of the two-pass scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_validator_spark.operators.packing import (
    apply_mixture_plan,
    mixture_sampling_plan,
    pack_sequences,
    running_offset,
)


@pytest.fixture(scope="module")
def sized(spark):
    rows = [(i, (i * 7) % 13) for i in range(100)]  # includes zeros
    return spark.createDataFrame(rows, "doc_id long, tokens long")


def test_running_offset_matches_naive_cumsum(sized):
    got = {
        r["doc_id"]: r["offset"]
        for r in running_offset(
            sized, "tokens", "doc_id", block_rows=8
        ).collect()
    }
    acc = 0
    for i in range(100):
        assert got[i] == acc, i
        acc += (i * 7) % 13


def test_running_offset_block_size_invariant(sized):
    a = running_offset(sized, "tokens", "doc_id", block_rows=3).collect()
    b = running_offset(sized, "tokens", "doc_id", block_rows=1000).collect()
    assert sorted((r["doc_id"], r["offset"]) for r in a) == sorted(
        (r["doc_id"], r["offset"]) for r in b
    )


def test_pack_sequences_coordinates(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 25), (3, 16), (4, 3)],
        "doc_id long, tokens long",
    )
    got = {
        r["doc_id"]: (r["offset"], r["seq_id"], r["seq_pos"], r["n_seqs"])
        for r in pack_sequences(
            df, "tokens", "doc_id", seq_len=16, block_rows=2
        ).collect()
    }
    # stream: doc0 [0,10) seq0; doc1 zero-len at 10; doc2 [10,35) seq0-2;
    # doc3 [35,51) seq2-3; doc4 [51,54) seq3
    assert got[0] == (0, 0, 0, 1)
    assert got[1] == (10, 0, 10, 0)
    assert got[2] == (10, 0, 10, 3)
    assert got[3] == (35, 2, 3, 2)
    assert got[4] == (51, 3, 3, 1)


def test_rowbearing_window_is_partitioned(sized):
    plan = running_offset(sized, "tokens", "doc_id")._jdf.queryExecution().toString()
    # every Window node over the full table must carry the block key in
    # its partition spec; the only permissible unpartitioned window is
    # the per-block totals frame (one row per block)
    import re

    windows = re.findall(r"Window \[(.*?)\], \[(.*?)\]", plan)
    assert windows, plan
    full_table = [w for w in windows if "_local_cum" in w[0]]
    assert full_table and all("_blk" in w[1] for w in full_table), windows


def test_mixture_sampling_plan(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 60 else ("de" if i < 80 else "zz")) for i in range(100)],
        "doc_id long, lang string",
    )
    got = {r["lang"]: r for r in mixture_sampling_plan(
        df, "lang", {"en": 0.5, "de": 0.5}
    ).collect()}
    # de binds: 20 rows at weight .5 → total 40 → 20 en + 20 de
    assert got["en"]["planned_rows"] == 20
    assert got["de"]["planned_rows"] == 20
    assert got["de"]["keep_rate"] == 1.0
    assert got["en"]["keep_rate"] == pytest.approx(20 / 60, abs=1e-6)
    assert got["zz"]["planned_rows"] == 0 and got["zz"]["weight"] == 0.0


def test_mixture_rejects_zero_mass(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        mixture_sampling_plan(df, "lang", {"en": 0.0})


def test_apply_mixture_plan_exact_quotas_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 60 else ("de" if i < 80 else "zz")) for i in range(100)],
        "doc_id long, lang string",
    )
    out = apply_mixture_plan(df, "lang", {"en": 0.5, "de": 0.5}, key_col="doc_id")
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # the plan says 20 en + 20 de (de binds); zz has weight 0 → excluded
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 20, "de": 20}
    # deterministic: the same doc_ids on a rerun
    again = {
        (r["lang"], r["doc_id"])
        for r in apply_mixture_plan(
            df, "lang", {"en": 0.5, "de": 0.5}, key_col="doc_id"
        ).collect()
    }
    assert {(r["lang"], r["doc_id"]) for r in rows} == again
    # all selected rows are real members of their domain
    assert by_lang["en"] <= set(range(60)) and by_lang["de"] <= set(range(60, 80))


def test_running_offset_rejects_negative_order_col(spark):
    df = spark.createDataFrame(
        [(-1, 5), (0, 5), (1, 5)], "doc_id long, tokens long"
    )
    with pytest.raises(Exception, match="non-negative"):
        running_offset(df, "tokens", "doc_id").collect()


def test_mixture_ulp_total_passes_weights_through(spark):
    # ten weights of 0.1 float-sum to 0.9999999999999999 — one ulp under
    # 1.0.  Re-normalizing by that total perturbs each weight upward and
    # the floor()-ed supported total drops from 1000 to 999, shaving a row
    # off every domain; the ulp guard must pass the weights through.
    langs = [f"d{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(i, langs[i % 10]) for i in range(1000)],
        "doc_id long, lang string",
    )
    w = {lang: 0.1 for lang in langs}
    assert sum(w.values()) != 1.0  # the float sum really is off 1.0
    got = {r["lang"]: r for r in mixture_sampling_plan(df, "lang", w).collect()}
    assert all(got[lang]["planned_rows"] == 100 for lang in langs), got
    assert all(got[lang]["keep_rate"] == 1.0 for lang in langs)

"""Entity-resolution operator: blocking discipline + integer scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_validator_spark.operators.linkage import link_entity_pairs


def test_link_entity_pairs_scoring_and_blocking(spark):
    """Known-value grid: identical entities score 100; same name but
    different block NEVER meet (blocking is the only join); partial
    agreement lands mid-scale; threshold filters."""
    df = spark.createDataFrame(
        [
            (1, "red widget", "B1", "T1", 5),
            (2, "red widget", "B1", "T1", 5),    # exact dup of 1 → 100
            (3, "red widget", "B1", "T1", 9),    # same name, other block
            (4, "red gizmo", "B1", "T1", 5),     # 1 shared of 3 → 16+50=66
            (5, "red widget", "B2", "T1", 5),    # brand differs → 75
        ],
        "id long, name string, brand string, type string, size long",
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["inter"], r["uni"], r["brand_eq"], r["type_eq"], r["score"]
        )
        for r in link_entity_pairs(
            df, "id", "name", block_cols=["size"],
            eq_cols=["brand", "type"], threshold=0,
        ).collect()
    }
    assert got[(1, 2)] == (2, 2, 1, 1, 100)
    assert (1, 3) not in got and (2, 3) not in got  # different block
    assert got[(1, 4)] == (1, 3, 1, 1, 66)
    assert got[(1, 5)] == (2, 2, 0, 1, 75)

    matched = {
        (r["id_a"], r["id_b"])
        for r in link_entity_pairs(
            df, "id", "name", block_cols=["size"],
            eq_cols=["brand", "type"], threshold=75,
        ).collect()
    }
    assert matched == {(1, 2), (2, 5), (1, 5)}


def test_link_entity_pairs_no_block_cols(spark):
    """Token-only blocking: any shared token makes a candidate."""
    df = spark.createDataFrame(
        [(1, "alpha beta", "X"), (2, "beta gamma", "X"), (3, "delta", "X")],
        "id long, name string, brand string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in link_entity_pairs(
            df, "id", "name", eq_cols=["brand"], threshold=0
        ).collect()
    }
    assert set(got) == {(1, 2)}          # 3 shares no token with anyone
    assert got[(1, 2)] == (50 * 1) // 3 + 25


def test_link_entity_pairs_block_cap_leader_fallback(spark):
    """ADVICE r7: a frequent token (stop word) must not explode into an
    O(size²) block self-join.  Over the cap, the block degrades to
    leader edges — candidate count is linear in the block size and the
    graph stays connected through the leader."""
    rows = [(i, "common stopword", "B", "T", 1) for i in range(1, 21)]
    df = spark.createDataFrame(
        rows, "id long, name string, brand string, type string, size long"
    )
    capped = link_entity_pairs(
        df, "id", "name", block_cols=["size"], eq_cols=["brand", "type"],
        threshold=0, max_block_size=5,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    # leader edges only: 19 pairs (leader 1 ↔ each member), not C(20,2)
    assert pairs == {(1, i) for i in range(2, 21)}
    assert all(r["score"] == 100 for r in capped)


def test_brand_blocking_lossless_at_threshold_80(spark):
    """VERDICT r9 item 3: the registry entry blocks on brand, which is
    LOSSLESS at threshold 80 — a cross-brand pair scores at most
    name_weight + eq_weight·(other eq fields) = 50 + 25 = 75 < 80, so
    every pair that can reach the threshold agrees on brand and the
    brand block drops no match.  Drive both configs over a corpus
    CONSTRUCTED to contain the adversarial case (identical name + type,
    different brand — the exact pair threshold 75 used to admit) and
    pin equality of the match sets."""
    rows = [
        (1, "red shiny widget", "B1", "T1", 5),
        (2, "red shiny widget", "B1", "T1", 5),   # true dup → 100
        (3, "red shiny widget", "B2", "T1", 5),   # cross-brand J=1 → 75
        (4, "red shiny gizmo", "B1", "T1", 5),    # J=2/4 → 25+50=75
        (5, "blue dull widget", "B1", "T2", 5),
        (6, "red shiny widget", "B1", "T1", 7),   # other size block
    ]
    df = spark.createDataFrame(
        rows, "id long, name string, brand string, type string, size long"
    )
    kw = dict(eq_cols=["brand", "type"], threshold=80)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in link_entity_pairs(
            df, "id", "name", block_cols=["size", "brand"], **kw
        ).collect()
    }
    unblocked = {
        (r["id_a"], r["id_b"])
        for r in link_entity_pairs(
            df, "id", "name", block_cols=["size"], **kw
        ).collect()
    }
    assert blocked == unblocked == {(1, 2)}
    # the adversarial cross-brand pair exists and scores exactly 75 —
    # the test corpus is live (threshold 75 WOULD diverge)
    at75 = {
        (r["id_a"], r["id_b"])
        for r in link_entity_pairs(
            df, "id", "name", block_cols=["size"],
            eq_cols=["brand", "type"], threshold=75,
        ).collect()
    }
    assert (1, 3) in at75 and (2, 3) in at75


def test_link_entity_pairs_cap_inert_when_blocks_small(spark):
    """With every block under the cap the guarded plan returns exactly
    the uncapped candidate set (the registry entry relies on this)."""
    df = spark.createDataFrame(
        [
            (1, "red widget", "B1", "T1", 5),
            (2, "red widget", "B1", "T1", 5),
            (4, "red gizmo", "B1", "T1", 5),
            (5, "red widget", "B2", "T1", 5),
        ],
        "id long, name string, brand string, type string, size long",
    )
    kw = dict(block_cols=["size"], eq_cols=["brand", "type"], threshold=0)
    got_capped = sorted(
        tuple(r)
        for r in link_entity_pairs(
            df, "id", "name", max_block_size=1000, **kw
        ).collect()
    )
    got_uncapped = sorted(
        tuple(r)
        for r in link_entity_pairs(
            df, "id", "name", max_block_size=None, **kw
        ).collect()
    )
    # all four size-5 entities share the "red" token → C(4,2) pairs
    assert got_capped == got_uncapped and len(got_capped) == 6

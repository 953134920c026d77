"""Entity resolution / record linkage: blocked candidate generation +
field-agreement scoring (the Fellegi–Sunter shape, with fixed integer
agreement weights so verdicts are engine-portable).

The reference has no linkage surface; this is north-star scope — a
training-data pipeline deduplicating PRODUCT or AUTHOR entities across
sources needs exactly this: never all-pairs, block on cheap keys, score
only candidates, threshold into match/possible/non-match.

Scale contract:

- **Blocking is the only join** — candidates come from an equi-join on
  (blocking token, exact keys), so the shuffle carries (id, block-key)
  pairs; an entity pair never meets unless it shares a block.  Classic
  multi-pass linkage runs this operator once per blocking scheme and
  unions the pairs.
- **Scoring is pure integer arithmetic** — token-set Jaccard as
  ``(w · |A∩B|) div |A∪B|`` plus fixed weights per exact-equality
  field.  No floats anywhere, so the DuckDB oracle reproduces scores
  bit-exactly (the same integer-div idiom as the sampling oracles).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_entity_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    eq_cols: Sequence[str] = (),
    name_weight: int = 50,
    eq_weight: int = 25,
    threshold: int = 75,
) -> DataFrame:
    """Candidate pairs of entities likely to be the SAME real-world
    thing: block on (each distinct name token × ``block_cols``), then
    score ``name_weight·Jaccard(name tokens)`` (integer div) plus
    ``eq_weight`` per agreeing ``eq_cols`` field; keep pairs with
    ``score >= threshold``.

    Returns ``(id_a, id_b, inter, uni, <c>_eq..., score)`` with
    ``id_a < id_b`` — the agreement vector ships with the score so a
    reviewer (or a downstream trained model) can re-weight without
    re-running the join.
    """
    toks = F.array_distinct(F.split(F.col(name_col), " "))
    p = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        *[F.col(c) for c in [*block_cols, *eq_cols]],
    )
    b = p.select(
        "id", F.explode("toks").alias("tok"), *[F.col(c) for c in block_cols]
    )
    left = b.select(
        F.col("id").alias("id_a"),
        "tok",
        *[F.col(c).alias(f"_bl_{c}") for c in block_cols],
    )
    right = b.select(
        F.col("id").alias("id_b"),
        "tok",
        *[F.col(c).alias(f"_br_{c}") for c in block_cols],
    )
    cond = [left["tok"] == right["tok"]] + [
        left[f"_bl_{c}"] == right[f"_br_{c}"] for c in block_cols
    ]
    cand = (
        left.join(right, cond)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pa = p.select(
        F.col("id").alias("id_a"),
        F.col("toks").alias("_ta"),
        *[F.col(c).alias(f"_a_{c}") for c in eq_cols],
    )
    pb = p.select(
        F.col("id").alias("id_b"),
        F.col("toks").alias("_tb"),
        *[F.col(c).alias(f"_b_{c}") for c in eq_cols],
    )
    scored = (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_ta", "_tb"))
            .cast("long")
            .alias("inter"),
            F.size(F.array_distinct(F.concat("_ta", "_tb")))
            .cast("long")
            .alias("uni"),
            *[
                (F.col(f"_a_{c}") == F.col(f"_b_{c}"))
                .cast("int")
                .alias(f"{c}_eq")
                for c in eq_cols
            ],
        )
    )
    score = F.expr(f"({int(name_weight)} * inter) div uni")
    for c in eq_cols:
        score = score + F.lit(int(eq_weight)) * F.col(f"{c}_eq")
    return scored.withColumn("score", score.cast("long")).filter(
        F.col("score") >= threshold
    )

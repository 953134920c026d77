"""Capture ``explain('formatted')`` for every registry entry.

    python scripts/capture_plans.py <tag> [names...]

Writes ``plans/r13/<query>_<tag>.txt`` at the repo root for each entry
(default: the whole registry).  Entries routed through
``materialize_release`` return a LocalRelation (the collected rows), so
the real distributed plan is captured by intercepting the helper and
dumping the pre-collect plan(s) alongside the returned frame's plan.

Plan capture only — no timing; run the bench for numbers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from big_data_validator_spark.operators import dedup as D
from big_data_validator_spark.plans.inspect import formatted_explain
from big_data_validator_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r13",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bdv-plan-capture")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Intercept materialize_release: the distributed plan is the frame
    # passed IN, not the LocalRelation handed back.
    captured: list[str] = []
    real_mr = D.materialize_release

    def spying_mr(df, *sources):
        captured.append(formatted_explain(df))
        return real_mr(df, *sources)

    D.materialize_release = spying_mr

    registry = all_queries()
    names = [n for n in registry if not only or n in only]
    for name in names:
        captured.clear()
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = registry[name](spark, SF_DIR)
            parts = []
            for i, inner in enumerate(captured):
                parts.append(
                    f"== materialized (pre-collect) plan #{i + 1} ==\n{inner}"
                )
            parts.append(f"== returned frame plan ==\n{formatted_explain(df)}")
            body = "\n\n".join(parts)
        except Exception as exc:  # record, keep going
            body = f"ERROR capturing plan: {exc!r}"
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(f"query: {name}\nsf_dir: {SF_DIR}\ntag: {tag}\n\n{body}\n")
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

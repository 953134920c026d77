"""Capture ``explain('formatted')`` for every registry entry.

    python scripts/capture_plans.py <tag> [names...]

Writes ``plans/r14/<query>_<tag>.txt`` at the repo root for each entry
(default: the whole registry).  Entries routed through
``materialize_release`` return a LocalRelation (the collected rows), so
the real distributed plan is captured by intercepting the helper and
dumping the pre-collect plan(s) alongside the returned frame's plan.
Additionally (VERDICT r13 item 9), EVERY eager DataFrame action fired
while an entry builds — collect / count / first / take inside an
operator body (Theil-Sen's selection passes, the linkage pattern-count
collect, union-find probes) — has its plan captured, so eager entries
no longer dump as a bare ``Scan ExistingRDD`` stub.

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
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
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
    captured: list[tuple[str, str]] = []
    real_mr = D.materialize_release

    def spying_mr(df, *sources):
        captured.append(("materialized (pre-collect)", formatted_explain(df)))
        return real_mr(df, *sources)

    D.materialize_release = spying_mr

    # Intercept every eager action an operator body fires while the
    # entry builds (VERDICT r13 item 9): a local-result entry's real
    # distributed plans are the ones its collect/count/first/take
    # calls execute, not the LocalRelation it returns.  A LocalRelation
    # source itself is skipped (noise).  materialize_release's own
    # collect is already captured above with a better label.
    # Spark 4: pyspark.sql.DataFrame is the abstract base; sessions
    # hand out pyspark.sql.classic.dataframe.DataFrame, whose own
    # method overrides must be the patch target.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame as _DF

    _real_actions = {n: getattr(_DF, n) for n in ("collect", "count", "take")}

    def _spy(action_name):
        real = _real_actions[action_name]

        def wrapper(self, *a, **kw):
            try:
                plan = formatted_explain(self)
                # skip pure driver-local frames (LocalTableScan /
                # ExistingRDD with no distributed work) — noise
                if any(
                    marker in plan
                    for marker in (
                        "Exchange",
                        "HashAggregate",
                        "Join",
                        "Scan parquet",
                        "InMemory",
                        "Window",
                    )
                ):
                    captured.append((f"eager {action_name}()", plan))
            except Exception:
                pass
            return real(self, *a, **kw)

        return wrapper

    for n in _real_actions:
        setattr(_DF, n, _spy(n))

    registry = all_queries()
    names = [n for n in registry if not only or n in only]
    for name in names:
        captured.clear()
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = registry[name](spark, SF_DIR)
            parts = []
            for i, (label, inner) in enumerate(captured):
                parts.append(f"== {label} plan #{i + 1} ==\n{inner}")
            parts.append(f"== returned frame plan ==\n{formatted_explain(df)}")
            body = "\n\n".join(parts)
        except Exception as exc:  # record, keep going
            body = f"ERROR capturing plan: {exc!r}"
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(f"query: {name}\nsf_dir: {SF_DIR}\ntag: {tag}\n\n{body}\n")
        print(name, flush=True)
    for n, real in _real_actions.items():
        setattr(_DF, n, real)
    spark.stop()


if __name__ == "__main__":
    main()

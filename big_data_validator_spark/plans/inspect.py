"""Physical-plan inspection: the feedback loop for 100 TB design.

Every operator's plan should be *audited*, not assumed: filters pushed to
the scan, columns pruned, small dims broadcast, top-k as
TakeOrderedAndProject, hot expressions inside WholeStageCodegen.  These
helpers turn ``explain()`` text into assertable facts — used by
``tests/test_plans.py`` to pin plan shape so a refactor that silently
regresses into a shuffle or a full-column scan fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (AQE-final where applicable) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    """`df.explain('formatted')` as a string (same JVM bridge the Python
    `explain()` uses; `QueryExecution.explainString` itself takes an enum
    py4j can't build)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the file scan (parquet row-group pruning)."""
    text = formatted_explain(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the scan actually reads (column pruning check): a 2-column
    projection reading 11 columns is a plan bug."""
    text = formatted_explain(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — zero means the plan fell off
    the codegen path entirely.

    Under AQE the codegen spans only exist in the *finalized* plan of the
    DataFrame's own QueryExecution, so this executes it once via
    ``collect()`` (a noop write would finalize a different
    QueryExecution).  Audit/test helper — don't call on production-size
    results."""
    if "isFinalPlan=false" in executed_plan(df):
        df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def shuffle_count(df: DataFrame) -> int:
    """Exchanges in the plan — every one is a full network shuffle of its
    input; the scale budget counts these."""
    return executed_plan(df).count("Exchange ")


def plan_report(df: DataFrame) -> dict:
    """One-stop audit dict for a query plan."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema_columns(df),
        "broadcast_join": has_broadcast_join(df),
        "take_ordered": has_take_ordered(df),
        "codegen_spans": wholestage_codegen_ids(df),
        "shuffles": shuffle_count(df),
    }

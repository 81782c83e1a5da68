"""Physical-plan assertions — the "would this survive a 100x scale-up" checks.

The reference has no planner (SURVEY.md §4); Catalyst is ours for free, but
only if the DataFrame program doesn't defeat it. These helpers let tests (and
reviews) assert the plan properties that matter at 100 TB:

- filters/column pruning reach the parquet scan (PushedFilters / ReadSchema)
- small dims broadcast (BroadcastHashJoin, not SortMergeJoin)
- a pipeline has exactly the shuffles it should (count Exchange nodes)
- per-document work stays in ONE Arrow stage (count ArrowEvalPython /
  MapInPandas nodes)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count (excluding broadcast exchanges — those are the point)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan))


def count_python_stages(df: DataFrame) -> int:
    plan = physical_plan(df)
    return len(re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython", plan))


def has_row_python_udf(df: DataFrame) -> bool:
    """True if any slow-path row-at-a-time Python UDF is in the plan
    (BatchEvalPython = pickled row UDF, the thing the north rule bans)."""
    return "BatchEvalPython" in physical_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln)


def read_schema(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln)

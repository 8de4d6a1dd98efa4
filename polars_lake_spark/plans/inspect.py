"""Physical-plan inspection utilities.

The reference exposes its optimizer only through a commented-out
``explain`` debug hook (``/root/reference/src/database.rs:53``) and a
pushdown experiment script (``/root/reference/test.py:14-18``).  Here plan
inspection is a first-class engine API: ``plan_report`` summarizes the
scale-relevant properties of a plan — what reached the Parquet scan
(pushed filters, partition filters, read schema), how many exchanges
(shuffles) and broadcasts it contains, and whether whole-stage codegen
covers the hot path — so tests and operators can assert plan quality, not
just result correctness.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (final plan when AQE has executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """spark's explain('formatted') as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant plan properties."""
    plan = executed_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    partition_filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: ([^\n,]*)", plan)
    return {
        "n_scans": plan.count("FileScan"),
        "n_exchanges": plan.count("Exchange"),
        "n_broadcasts": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": [p for p in pushed if p],
        "partition_filters": [p for p in partition_filters if p],
        "read_schemas": read_schemas,
        "uses_aqe": "AdaptiveSparkPlan" in plan,
    }

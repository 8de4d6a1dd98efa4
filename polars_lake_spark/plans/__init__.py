from polars_lake_spark.plans.inspect import (
    executed_plan,
    explain_formatted,
    plan_report,
)

__all__ = ["executed_plan", "explain_formatted", "plan_report"]

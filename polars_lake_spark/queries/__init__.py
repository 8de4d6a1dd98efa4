"""Query registry: every implemented operator from SURVEY.md §2 has an
entry here — a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(where ANSI-SQL-expressible) an equivalent DuckDB oracle SQL string.

Determinism rules so the driver's order-insensitive value-hash matches:
every float output is rounded in BOTH dialects; LIMIT always rides on a
total ORDER BY; no first()/last()/approx results in oracled queries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional


@dataclass
class Query:
    fn: Callable
    oracle: Optional[str] = None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules once, on first use.
    from polars_lake_spark.queries import (  # noqa: F401
        advanced,
        corpus,
        functions_ext,
        mutation,
        pipeline,
        relational,
        reshape,
        scale_ops,
        tpch_like,
        tpch_like2,
        windows_ext,
    )

    return REGISTRY

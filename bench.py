"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's measurement categories (BASELINE.md): full-scan
aggregate, point filter, star join, top-k, windows, sessionization, merge
(upsert), dedup (exact + minhash scale path), similarity top-k, text
analysis.  Results are materialized with the noop sink so timings measure
the full distributed compute without driver-collect overhead.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "q1_pricing_summary",
    "point_filter",
    "star_join_revenue",
    "top_customers",
    "agg_stats",
    "window_functions",
    "events_sessionize",
    "events_hourly_rollup",
    "upsert_merge",
    "delete_anti",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk",
    "text_stats",
    "token_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from polars_lake_spark.queries import all_queries
    from polars_lake_spark.session import get_spark

    spark = get_spark("polars-lake-spark-bench")
    registry = all_queries()

    # JVM/codegen warmup outside the timed region.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

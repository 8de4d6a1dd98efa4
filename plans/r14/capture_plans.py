"""Capture .explain("formatted") for headline registry queries.

Usage: python plans/r14/capture_plans.py <suffix> [entry ...]
Writes plans/r14/<name>_<suffix>.txt for each entry.  Only LAZY entries
are safe to capture cheaply (check-style lifecycle queries execute their
whole engine lifecycle inside fn()); the default list below is the lazy
subset of bench.HEADLINE.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

LAZY = [
    "q1_pricing_summary",
    "point_filter",
    "star_join_revenue",
    "top_customers",
    "agg_stats",
    "window_functions",
    "events_sessionize",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_topk",
    "text_stats",
    "token_count",
    "corpus_pipeline",
    "events_session_window",
    "grouping_sets",
    "minmax_by",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "asof_join_events",
    "range_join_events",
    "dedup_simhash",
    "dedup_clusters",
    "sample_hash",
    "pack_sequences",
    "multimodal_image_features",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "text_tfidf_top_terms",
    "window_range_frames",
    "exact_percentiles_windowed",
    "multimodal_pixel_decode",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    "shard_manifest",
    "semdedup_embeddings",
    "dedup_substring_winnow",
    "decontaminate_substring",
    "token_heavy_hitters",
    "skew_hot_keys",
    "events_ewma",
    "dedup_prefix_join",
    "sample_weighted_aes",
    "graph_pagerank",
    "bloom_semi_join",
    "topk_per_group_twostage",
    "dedup_snm",
    "scrub_repeated_spans",
    "hybrid_retrieval_rrf",
    "retrieval_eval_metrics",
    "bm25_retrieval",
    "retrieval_snippets",
    "hard_negative_mining",
    "bm25_batch_retrieval",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or LAZY
    from polars_lake_spark.queries import all_queries
    from polars_lake_spark.session import get_spark

    spark = get_spark("plan-capture")
    registry = all_queries()
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        try:
            df = registry[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"captured {name}", flush=True)
        except Exception as e:  # noqa: BLE001 - keep capturing the rest
            print(f"FAILED {name}: {e!r}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

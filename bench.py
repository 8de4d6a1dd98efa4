"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's measurement categories (BASELINE.md): full-scan
aggregate, point filter, star join, top-k, windows, sessionization, merge
(upsert), dedup (exact + minhash scale path), similarity top-k, text
analysis.  Results are materialized with the noop sink so timings measure
the full distributed compute without driver-collect overhead.

Variance protocol (VERDICT r11 #2 — round-over-round totals on this host
are tail-spike-dominated): every steady-state entry runs
$SPARK_GRAFT_BENCH_REPEATS times (default 2) warm in one session and
reports the MIN; the full JSON line carries every raw run under "runs"
and both lines carry a "protocol" summary including the median
same-code run2/run1 ratio (the A/B delta — a genuine code regression
moves the min, a host spike only widens the ratio).  One-time entries
(index builds, tokenizer training) stay single-run — they are amortized
setup, not steady state.
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
    "similarity_ivf",
    # r2 additions — the headline set is FROZEN from here on so
    # round-over-round regressions stay attributable.
    "dedup_simhash",
    "dedup_clusters",
    "sample_hash",
    "pack_sequences",
    "multimodal_image_features",
    # r2 later additions (appended — earlier entries stay attributable)
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "text_tfidf_top_terms",
    "window_range_frames",
    # r5 (r4 VERDICT item 3): the exact-percentile headline is the
    # sort-spill windowed formulation (operators/quantiles.py) — same
    # oracle, no per-group executor-memory cliff at 100 TB group sizes.
    # The builtin-percentile variant stays registered/oracled as
    # "exact_percentiles".
    "exact_percentiles_windowed",
    "time_travel_upsert",
    # r5 additions (appended — the frozen prefix stays attributable):
    # real multimodal codecs, all map-side mapInPandas chains.
    "multimodal_pixel_decode",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    # r5 additions: training-set assembly (operators/splits.py).
    "shard_manifest",
    "semdedup_embeddings",
    # r5 additions: incremental dedup (batch vs indexed corpus, probe cost
    # O(batch)) and winnowing exact-substring fingerprints.
    "dedup_incremental_minhash",
    "dedup_substring_winnow",
    "decontaminate_substring",
    # r5 additions: Misra-Gries two-pass exact top-k (tokens never
    # shuffle in pass 1; pass 2 groupBy keys bounded by candidates).
    "token_heavy_hitters",
    # r5 additions: hot-key skew probe + single-exchange time-series
    # windows (EWMA fold / trailing z-score).
    "skew_hot_keys",
    "events_ewma",
    # r5 additions: incremental winnow probe + the HLL sketch-rollup
    # engine lifecycle (create -> append -> incremental refresh).
    "dedup_incremental_winnow",
    "sketch_rollup_lifecycle",
    # r5 additions: prefix-filter EXACT similarity join (the
    # no-false-negative counterpart to dedup_minhash_lsh), A-ES weighted
    # sampling, and distributed BPE (train = 24 merge rounds over the
    # distinct-word table; encode = Arrow-batched map-side pass).
    "dedup_prefix_join",
    "sample_weighted_aes",
    "bpe_train_encode_check",
    # r5: integer-exact PageRank over the customer->supplier purchase
    # graph (8 iterations, per-iteration keyed join + grouped sum).
    "graph_pagerank",
    # r5: manual runtime filter (map-side bloom prefilter ahead of the
    # semi-join shuffle) and two-stage skew-safe top-k per group.
    "bloom_semi_join",
    "topk_per_group_twostage",
    # r5: sorted-neighborhood dedup on the distributed global rank
    # (range partitions + offset prefix-sum, no single-task sort).
    "dedup_snm",
    # r5: intra-doc repeated-span scrubbing (map-side chunking, one
    # (doc, chunk) shuffle for the first-occurrence window).
    "scrub_repeated_spans",
    # r7: the end-to-end curation composition (exact dedup -> MinHash
    # dedup -> decontaminate -> quality-sample -> BPE pack -> shard) —
    # the "whole pipeline" number an LLM-data user actually runs.
    "curation_lifecycle_check",
    # r9: zone-map file skipping gate (build two range-clustered writes,
    # prune a BETWEEN on the non-layout key, verify pruned == full).
    "scan_file_skipping_check",
    # r9: retrieval — BM25 (token stream filtered to query terms before
    # any shuffle), the BM25+cosine hybrid fused by integer-exact RRF,
    # and map-side best-snippet extraction (one aggregate HOF per row).
    "bm25_retrieval",
    "hybrid_retrieval_rrf",
    "retrieval_snippets",
    "hard_negative_mining",
    "bm25_batch_retrieval",
    # r9: persisted BM25 index probe lifecycle (create -> add_batch ->
    # replay no-op -> zone-map-skipped postings probe).
    "bm25_index_probe_check",
    # r10: zone-map skipping under time-travel SQL; ranked-retrieval
    # eval metrics over a real batch-BM25 run. (bm25_index_cdc_sync_check
    # stays a correctness-gate-only query: its cost is ~20 snapshot
    # commits of job overhead — a lifecycle replay proof, not a serving
    # shape; the steady-state probe cost is already measured by
    # bm25_index_probe_check.)
    "sql_timetravel_skipping_check",
    "retrieval_eval_metrics",
    # r10: metadata COUNT — full-match files answered from footers,
    # boundary files scanned (the selective-dashboard-count shape).
    "count_where_skipping_check",
    # r10: quality expectations (drop/track) applied across the write
    # paths — the quarantine-on-ingest lifecycle.
    "expectations_lifecycle_check",
    # r11: positional phrase query through the SAME pruned postings
    # probe (the serving shape for exact-phrase search; gate overhead is
    # the index build, the probe is the fast part). partition metadata
    # rollup (grouped COUNT answered driver-locally, no FileScan).
    # (stream_apply_changes_check stays correctness-gate-only: its cost
    # is two real availableNow streams of commit overhead — an ordering
    # proof, not a serving shape.)
    "bm25_phrase_check",
    "partition_meta_rollup_check",
]


def lifecycle_bench(spark, sf_dir: str) -> dict[str, float]:
    """Engine lifecycle measurements mirroring the reference's inline
    instrumentation (BASELINE.md): create (partitioned+bucketed write),
    manifest load, bulk + single-row upsert, materialize, sequential and
    concurrent point queries."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.sources import load_table

    root = tempfile.mkdtemp(prefix="plsbench_")
    out: dict[str, float] = {}
    try:
        li = load_table(spark, sf_dir, "lineitem")

        t0 = time.perf_counter()
        engine = Engine(spark, root)
        engine.create_table(
            "li",
            li,
            partition_by=["l_returnflag"],
            bucket_by=["l_orderkey"],
            n_buckets=8,
            keys=["l_orderkey", "l_linenumber"],
        )
        out["lifecycle_create_table"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        e2 = Engine(spark, root)
        e2.load_all()
        e2.table_info("li")
        out["lifecycle_load_and_info"] = round(time.perf_counter() - t0, 3)

        # bulk upsert: reprice ~10% of rows (analog of the reference's
        # 300k-row upsert, /root/reference/src/dataset.rs:442-446)
        batch = li.filter(F.col("l_orderkey") % 10 == 0).withColumn(
            "l_extendedprice", F.col("l_extendedprice") * 1.01
        )
        t0 = time.perf_counter()
        e2.upsert("li", batch)
        out["lifecycle_bulk_upsert"] = round(time.perf_counter() - t0, 3)

        one = li.limit(1).withColumn("l_extendedprice", F.lit(1.0))
        t0 = time.perf_counter()
        e2.upsert("li", one)
        out["lifecycle_single_row_upsert"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        df = e2.table("li").cache()
        df.count()
        out["lifecycle_materialize"] = round(time.perf_counter() - t0, 3)

        # point queries (analog of /root/reference/call.py:53-79)
        def point(k: int) -> int:
            # CAST the literal: Murmur3 hash(INT) != hash(BIGINT), so an
            # untyped literal would compute a wrong bucket and count 0.
            return e2.sql(
                f"SELECT * FROM li WHERE l_orderkey = {k} AND "
                f"bucket_id = pmod(hash(CAST({k} AS BIGINT)), 8)"
            ).count()

        keys = [r.l_orderkey for r in li.select("l_orderkey").distinct().limit(20).collect()]
        t0 = time.perf_counter()
        for k in keys[:10]:
            point(k)
        out["lifecycle_point_queries_x10"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=20) as pool:
            list(pool.map(point, keys))
        out["lifecycle_point_queries_20threads"] = round(time.perf_counter() - t0, 3)
        df.unpersist()

        # r7: partition-scoped DELETE — the statement matches one
        # l_returnflag partition, so replace_where rewrites only that
        # slice (previously a full static-overwrite rewrite; compare
        # against lifecycle_bulk_upsert's full-width write cost).
        t0 = time.perf_counter()
        e2.sql("DELETE FROM li WHERE l_returnflag = 'R' AND l_quantity < 5")
        out["lifecycle_scoped_delete"] = round(time.perf_counter() - t0, 3)

        # r8: deletion-vector sparse delete — a custkey predicate matches
        # rows across many month partitions; with DVs the statement
        # commits an O(matched) sidecar and rewrites NOTHING (contrast
        # lifecycle_scoped_delete, which rewrites its touched partition).
        orders = load_table(spark, sf_dir, "orders")
        e2.create_table(
            "odv",
            orders.select(
                "o_orderkey",
                "o_custkey",
                F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                    "month"
                ),
                "o_totalprice",
            ),
            partition_by=["month"],
            keys=["o_orderkey"],
            versioned=True,
            deletion_vectors=True,
        )
        k = orders.groupBy("o_custkey").count().orderBy(
            F.desc("count"), "o_custkey"
        ).head().o_custkey
        t0 = time.perf_counter()
        e2.sql(f"DELETE FROM odv WHERE o_custkey = {k}")
        out["lifecycle_dv_sparse_delete"] = round(time.perf_counter() - t0, 3)

        # r9: what reads PAY while DVs are live — the broadcast anti-join
        # above the scans (folded away by the next OPTIMIZE). Compare
        # against lifecycle_materialize-style full reads.
        t0 = time.perf_counter()
        e2.table("odv").groupBy("month").agg(
            F.sum("o_totalprice").alias("s")
        ).write.format("noop").mode("overwrite").save()
        out["lifecycle_dv_read_overhead"] = round(time.perf_counter() - t0, 3)

        # r9: zone-map file skipping — ten point lookups on the
        # NON-layout l_orderkey against a range-clustered versioned
        # table: the per-write-dir parquet-footer zone maps prune to
        # O(1) files per probe before Spark plans a task (contrast
        # lifecycle_point_queries, whose pruning rides the bucket
        # layout key).
        e2.create_table(
            "lzm",
            load_table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
            )
            .repartitionByRange(16, "l_orderkey"),
            versioned=True,
        )
        zks = [
            r.l_orderkey
            for r in e2.table("lzm")
            .select("l_orderkey")
            .distinct()
            .limit(10)
            .collect()
        ]
        t0 = time.perf_counter()
        for zk in zks:
            e2.scan_where("lzm", f"l_orderkey = {zk}").count()
        out["lifecycle_zonemap_scan_x10"] = round(time.perf_counter() - t0, 3)

        # r13 (VERDICT r12 item #6): the CDC apply tier — Type-1 and
        # SCD2 apply_changes over a KEY-CLUSTERED versioned target,
        # three narrow-key-range micro-batches each: the steady-state
        # cost a streaming trigger pays round-over-round.  The probes'
        # files_kept/files_total land on stderr so the key-range pruning
        # (the tier's 100 TB story) stays attributable per round.
        import sys

        from polars_lake_spark.streaming.ingest import (
            apply_changes_batch,
            apply_changes_scd2_batch,
            scd2_init,
        )

        cap_prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "25000")
        try:
            base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
            bounds = base.agg(
                F.min("o_orderkey"), F.max("o_orderkey")
            ).head()
            lo, hi = bounds[0], bounds[1]

            def cdc_batches():
                for i in range(3):
                    a = lo + (hi - lo) * i // 40
                    b = lo + (hi - lo) * (i + 1) // 40
                    yield (
                        base.filter(
                            (F.col("o_orderkey") >= a)
                            & (F.col("o_orderkey") < b)
                        )
                        .withColumn(
                            "o_totalprice", F.col("o_totalprice") + 1.0
                        )
                        .withColumn(
                            "_op",
                            F.when(
                                F.col("o_orderkey") % 13 == 0,
                                F.lit("delete"),
                            ).otherwise(F.lit("update")),
                        )
                        .withColumn("seq", F.lit(10 + i))
                    )

            e2.create_table(
                "cdc_t1",
                base,
                keys=["o_orderkey"],
                versioned=True,
                cluster_by=["o_orderkey"],
            )
            e2.cdc_probe_reports = []
            t0 = time.perf_counter()
            for b in cdc_batches():
                apply_changes_batch(e2, "cdc_t1", b, sequence_by="seq")
            out["lifecycle_cdc_apply_type1_x3"] = round(
                time.perf_counter() - t0, 3
            )
            t1_reports = e2.cdc_probe_reports

            scd2_init(
                e2,
                "cdc_scd2",
                base,
                ["o_orderkey"],
                versioned=True,
                cluster_by=["o_orderkey"],
            )
            e2.cdc_probe_reports = []
            t0 = time.perf_counter()
            for b in cdc_batches():
                apply_changes_scd2_batch(e2, "cdc_scd2", b, sequence_by="seq")
            out["lifecycle_cdc_apply_scd2_x3"] = round(
                time.perf_counter() - t0, 3
            )
            for tag, reps in (
                ("type1", t1_reports),
                ("scd2", e2.cdc_probe_reports),
            ):
                ft = sum(r["files_total"] for r in reps)
                fk = sum(r["files_kept"] for r in reps)
                print(
                    f"[bench] cdc {tag} probes: {len(reps)} pruned scans, "
                    f"files read {fk}/{ft}",
                    file=sys.stderr,
                )
        finally:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", cap_prev)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def ivf_amortized_setup(spark, sf_dir: str):
    """Train + persist the IVF index OUTSIDE the headline probe timing
    (r4 VERDICT item 2): at 100 TB you never retrain per query — the
    index is built once and probed millions of times. The headline
    ``similarity_ivf`` entry now measures the amortized probe path
    (``ivf_search_pruned`` against the persisted cell-partitioned index);
    the one-time train+index cost is reported separately as
    ``similarity_ivf_train_index``.

    Returns (probe_fn, train_sec, cleanup_fn). Centroids are collected
    (k rows) and re-created as a literal DataFrame so the per-query
    ``clearCache`` hygiene between headline entries cannot silently
    re-trigger Lloyd iterations through cached lineage."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.ivf import (
        ivf_search_pruned,
        ivf_write_index,
        train_ivf,
    )
    from polars_lake_spark.sources import load_table

    root = tempfile.mkdtemp(prefix="plsbench_ivf_")
    engine = Engine(spark, root)
    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    trained = train_ivf(emb, k=8, iters=2)
    centroids = spark.createDataFrame(
        [(r.cell_id, list(r.cv), float(r.cnrm)) for r in trained.collect()],
        "cell_id int, cv array<double>, cnrm double",
    )
    ivf_write_index(engine, "ivf_idx", emb, centroids)
    train_sec = round(time.perf_counter() - t0, 3)

    def probe(spark, sf_dir):
        queries = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 10
        )
        return ivf_search_pruned(
            engine, "ivf_idx", centroids, queries, k=5, nprobe=4
        )

    def cleanup():
        shutil.rmtree(root, ignore_errors=True)

    return probe, train_sec, cleanup


def dedup_amortized_setup(spark, sf_dir: str):
    """Build the PERSISTED incremental dedup indexes (MinHash + winnow)
    over the 80% corpus once, outside the probe timing — same argument as
    the IVF rewiring: at 100 TB the corpus is indexed once and probed per
    crawl batch; re-fingerprinting it inside every measured probe times a
    path production never runs. The registry entries keep the inline
    formulation (that is what the DuckDB oracle can replay); the HEADLINE
    times the probe against the persisted index tables, with the one-time
    build cost reported separately as ``dedup_index_build``.

    Returns (probe_fns_by_name, build_sec, cleanup_fn)."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from polars_lake_spark import Engine
    from polars_lake_spark.operators.incremental import MinHashIndex, WinnowIndex
    from polars_lake_spark.sources import load_table

    root = tempfile.mkdtemp(prefix="plsbench_dedup_")
    engine = Engine(spark, root)
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    t0 = time.perf_counter()
    mh = MinHashIndex(engine, "bench_mh", threshold=0.8)
    mh.create(corpus)
    wn = WinnowIndex(engine, "bench_wn", k=20, w=10, min_shared=2, max_bucket=50)
    wn.create(corpus)
    build_sec = round(time.perf_counter() - t0, 3)

    # Probe-ONLY plans (read the persisted index tables, never mutate):
    # the headline measures the per-batch pair computation — the corpus
    # side comes off the index parquet, never re-fingerprinted. add_batch
    # additionally pays checkpoint+insert jobs (ingest latency, flat in
    # corpus size — measured ~11 s on this container at ANY SF), which is
    # micro-batch cadence cost, not query cost.
    def probe_minhash(spark, sf_dir):
        from polars_lake_spark.operators.incremental import (
            incremental_minhash_pairs,
            prepare_docs,
        )

        batch = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 0
        )
        # bsh stays persisted through the lazy plan (it feeds the exact
        # verification join at execution time); the per-entry clearCache
        # hygiene in the timing loop releases it after the measurement
        bsh, bent = prepare_docs(batch, "doc_id", "text")
        return incremental_minhash_pairs(
            bsh, bent, engine.table("bench_mh_mh_entries"),
            engine.table("bench_mh_mh_shingles"), threshold=0.8,
        )

    def probe_winnow(spark, sf_dir):
        from polars_lake_spark.operators.incremental import (
            incremental_winnow_pairs,
        )

        batch = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 0
        )
        # checkpoint: the probe consumes the batch entries four times
        # (touched set, guard sizes, guard anti, cross) — one
        # materialization instead of four (still inside the timed region);
        # the fps cache is released immediately after (caller contract)
        fps, bent = wn._entries(batch, "doc_id", "text")
        bent = bent.localCheckpoint(eager=True)
        fps.unpersist()
        return incremental_winnow_pairs(
            bent, engine.table("bench_wn_wn_fps"), min_shared=2, max_bucket=50
        )

    def cleanup():
        shutil.rmtree(root, ignore_errors=True)

    return (
        {
            "dedup_incremental_minhash": probe_minhash,
            "dedup_incremental_winnow": probe_winnow,
        },
        build_sec,
        cleanup,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from polars_lake_spark.queries import all_queries
    from polars_lake_spark.session import get_spark

    spark = get_spark("polars-lake-spark-bench")
    registry = all_queries()

    # JVM/codegen warmup outside the timed region.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # Python-worker warmup: the first Arrow-batched stage otherwise pays
    # the one-time pyspark.daemon spawn (+pandas import) on every core —
    # ~20s of cold-start attributed to whichever query runs it first. On a
    # long-lived cluster the daemons exist; bench measures steady state.
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers).repartition(n_workers).mapInPandas(
        lambda batches: batches, schema="id long"
    ).count()

    # Attribution filter (VERDICT r13 perf item 3): a comma-separated
    # $SPARK_GRAFT_BENCH_ONLY restricts the run to the named entries so
    # regressed entries can be re-timed with high repeats without paying
    # for the full suite. Unset (the driver's case) == everything.
    only = frozenset(
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if s.strip()
    )

    def wanted(name: str) -> bool:
        return not only or name in only

    # One-time IVF train+index outside the probe timing (see
    # ivf_amortized_setup); its cost still counts once in the total.
    ivf_probe = ivf_train_sec = ivf_cleanup = None
    if wanted("similarity_ivf"):
        ivf_probe, ivf_train_sec, ivf_cleanup = ivf_amortized_setup(
            spark, sf_dir
        )
    # One-time dedup index builds (MinHash + winnow) — headline probes
    # run against the persisted tables (see dedup_amortized_setup).
    dedup_probes, dedup_build_sec, dedup_cleanup = {}, None, None
    if wanted("dedup_incremental_minhash") or wanted(
        "dedup_incremental_winnow"
    ):
        dedup_probes, dedup_build_sec, dedup_cleanup = dedup_amortized_setup(
            spark, sf_dir
        )

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))

    def hygiene():
        # Storage hygiene between measurements: operators that persist
        # intermediates (shingle sets, IVF centroids) must not bleed
        # executor memory into later queries' timings.  clearCache drops
        # SQL-cached relations; the GC pair lets ContextCleaner reap
        # localCheckpoint blocks from iterative operators (k-means,
        # connected components), which clearCache cannot see — measured
        # 3-6× tail-query slowdown when they accumulate.
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}

    def measure(name, thunk):
        # min-of-N warm runs (variance protocol): every run's raw value
        # is kept for the A/B attribution in the protocol summary
        rs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            thunk()
            rs.append(round(time.perf_counter() - t0, 3))
            hygiene()
        runs[name] = rs
        timings[name] = min(rs)

    for name in HEADLINE:
        if not wanted(name):
            continue
        if name == "similarity_ivf":
            fn = ivf_probe
        elif name in dedup_probes:
            fn = dedup_probes[name]
        elif name == "curation_lifecycle_check":
            # Amortize the pipeline's BPE training outside the timed
            # region (one_time key curation_bpe_train): it dominated the
            # entry's 19s and read as a steady-state regression every
            # round (VERDICT r7 item 3). The packing invariants the gate
            # oracle pins hold under any tokenizer; the DRIVER's gate
            # call still trains inline (merges=None).
            from polars_lake_spark.operators import bpe as _cb
            from polars_lake_spark.sources import load_table as _clt

            _t = time.perf_counter()
            _cm, _ = _cb.train_bpe(
                _cb.word_counts(_clt(spark, sf_dir, "documents"), "text"),
                n_merges=24,
                min_frequency=2,
            )
            timings["curation_bpe_train"] = round(time.perf_counter() - _t, 3)
            fn = lambda s, d: registry[name].fn(s, d, merges=_cm)  # noqa: E731
        else:
            fn = registry[name].fn
        measure(
            name,
            lambda fn=fn: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    if ivf_train_sec is not None:
        timings["similarity_ivf_train_index"] = ivf_train_sec
    if dedup_build_sec is not None:
        timings["dedup_index_build"] = dedup_build_sec

    # BPE encode throughput with TRAINING amortized outside the timed
    # region (same argument as the IVF probe: in production you train
    # once and encode forever; bpe_train_encode_check above times the
    # training itself).
    if wanted("bpe_encode_docs"):
        from polars_lake_spark.operators import bpe as _bpe
        from polars_lake_spark.sources import load_table as _lt

        _docs = _lt(spark, sf_dir, "documents")
        _t0 = time.perf_counter()
        _merges, _ = _bpe.train_bpe(_bpe.word_counts(_docs, "text"), 24)
        bpe_train_sec = round(time.perf_counter() - _t0, 3)
        measure(
            "bpe_encode_docs",
            lambda: _bpe.bpe_encode(_docs, "text", _merges)
            .select("doc_id", "tokens")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timings["bpe_train_only"] = bpe_train_sec
    if ivf_cleanup is not None:
        ivf_cleanup()
    if dedup_cleanup is not None:
        dedup_cleanup()
    # lifecycle entries: the whole self-contained lifecycle repeats
    # (each pass owns a fresh tmpdir engine); per-entry min reported.
    # Under ONLY, run it iff a lifecycle-produced key is requested (their
    # names all start with "lifecycle_").
    if not only or any(k.startswith("lifecycle_") for k in only):
        lc_runs = [lifecycle_bench(spark, sf_dir) for _ in range(repeats)]
        for k in lc_runs[0]:
            runs[k] = [r[k] for r in lc_runs]
            timings[k] = min(runs[k])

    total = round(sum(timings.values()), 3)
    # One-time train/index entries (the measured thing IS training, or an
    # index build amortized across every later probe) broken out into
    # their own section so the headline separates steady-state throughput
    # from amortized setup cost. The entries ALSO stay in "queries" under
    # their frozen names — nothing is renamed, the total is unchanged.
    one_time_keys = [
        "similarity_ivf_train_index",
        "dedup_index_build",
        "bpe_train_only",
        "bpe_train_encode_check",
        "curation_bpe_train",
    ]
    one_time = {k: timings[k] for k in one_time_keys if k in timings}
    steady = round(total - sum(one_time.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Variance-protocol summary: median same-code run2/run1 ratio across
    # repeated entries — the A/B delta the verdict asked to be recorded
    # with the totals (host spikes widen the ratio, code regressions
    # move the reported min).
    ratios = sorted(
        r[1] / r[0] for r in runs.values() if len(r) >= 2 and r[0] > 0
    )
    protocol = {
        "repeats": repeats,
        "per_entry": "min",
        "ab_ratio_median": (
            round(ratios[len(ratios) // 2], 3) if ratios else None
        ),
    }
    if only:
        # filtered attribution run: the partial total must never be
        # mistaken for a full-suite number when comparing recorded lines
        protocol["only"] = sorted(only)
    # Full per-query line first (68+ entries — for local analysis and
    # BENCH_r{N} diffing when the whole stdout is kept)...
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "protocol": protocol,
                "one_time": one_time,
                "steady_state_value": steady,
                "sf": sf_val,
            }
        )
    )
    # ...then a compact FINAL line carrying the headline entries, because
    # the driver records only the last ~2 KB of stdout and parses the
    # last complete JSON line in it: the full line outgrew that window at
    # r5 (68 entries ≈ 2.6 KB), so BENCH_r05/r06 recorded a truncated
    # tail and a null parse (VERDICT r6 item 5). Same contract keys
    # (metric/value/unit/queries/sf); "queries" here is the headline
    # subset, totals are identical to the full line's.
    headline_keys = [
        "q1_pricing_summary",
        "point_filter",
        "star_join_revenue",
        "top_customers",
        "agg_stats",
        "window_functions",
        "upsert_merge",
        "delete_anti",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_prefix_join",
        "dedup_clusters",
        "similarity_ivf",
        "graph_pagerank",
        "exact_percentiles_windowed",
        "bpe_encode_docs",
        "sketch_rollup_lifecycle",
        "lifecycle_bulk_upsert",
        "lifecycle_point_queries_x10",
        # appended r8 (frozen-prefix: append-only)
        "lifecycle_scoped_delete",
        "lifecycle_dv_sparse_delete",
        "curation_lifecycle_check",
        # appended r9
        "lifecycle_zonemap_scan_x10",
        "scan_file_skipping_check",
        "hybrid_retrieval_rrf",
        "lifecycle_dv_read_overhead",
        # appended r10
        "sql_timetravel_skipping_check",
        "retrieval_eval_metrics",
        "count_where_skipping_check",
        "expectations_lifecycle_check",
        # appended r11
        "bm25_phrase_check",
        "partition_meta_rollup_check",
    ]
    final_queries = {k: timings[k] for k in headline_keys if k in timings}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": final_queries,
                # raw per-repeat runs for every entry above, ALIGNED to
                # the "queries" key order (an array keeps this line
                # inside the driver's ~2 KB stdout window — VERDICT r13
                # perf item: regressions must be attributable from the
                # recorded line alone, min-of-N hides host spikes)
                "runs": [
                    [round(v, 2) for v in runs[k]] if k in runs else None
                    for k in final_queries
                ],
                "n_queries": len(timings),
                "protocol": protocol,
                "one_time_total": round(sum(one_time.values()), 3),
                "steady_state_value": steady,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Physical-plan quality gates (SURVEY.md §4): the scale properties are
asserted, not assumed — predicate pushdown to the Parquet scan, partition
and bucket pruning via the derived layout columns, broadcast joins for
small dims, column pruning in ReadSchema.
"""

import pyspark.sql.functions as F

from polars_lake_spark import Engine
from polars_lake_spark.plans import executed_plan as plan_of
from polars_lake_spark.plans import explain_formatted as formatted
from polars_lake_spark.plans import plan_report
from polars_lake_spark.queries import all_queries
from polars_lake_spark.sources import load_table


def test_plan_report_summary(spark, sf_dir):
    rep = plan_report(all_queries()["star_join_revenue"].fn(spark, sf_dir))
    assert rep["n_scans"] == 5
    assert rep["n_broadcasts"] >= 2
    assert rep["uses_aqe"]
    assert rep["pushed_filters"] or rep["read_schemas"]


def test_point_filter_pushdown(spark, sf_dir):
    df = all_queries()["point_filter"].fn(spark, sf_dir)
    plan = formatted(df)
    assert "PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,5)" in plan


def test_column_pruning(spark, sf_dir):
    df = all_queries()["point_filter"].fn(spark, sf_dir)
    plan = formatted(df)
    # ReadSchema must not include unprojected columns
    assert "l_comment" not in plan
    assert "l_returnflag" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = all_queries()["star_join_revenue"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region (always tiny);
    # customer is unhinted and AQE-decided — at local SF it also broadcasts


def test_q1_whole_stage_codegen(spark, sf_dir):
    df = all_queries()["q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = plan_of(df)
    # whole-stage codegen spans render as "*(n) Operator" in plan strings
    assert "*(1)" in plan
    assert "partial_sum" in plan  # map-side partial aggregation
    assert "HashAggregate" in plan  # hash, not sort-based agg


def test_partition_pruning_on_engine_table(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "li", li, partition_by=["l_returnflag"], bucket_by=["l_orderkey"], n_buckets=4
    )
    q = engine.table("li").filter(F.col("l_returnflag") == "A")
    plan = plan_of(q)
    # hive partition pruning: the partition filter appears as a
    # PartitionFilters entry, not a post-scan Filter
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1].split("]")[0]


def test_bucket_pruning_via_derived_column(spark, sf_dir, tmp_path):
    """An equality predicate on the bucket source key + the derived
    bucket_id predicate prunes to one bucket directory."""
    from polars_lake_spark.layout import bucket_expr

    li = load_table(spark, sf_dir, "lineitem")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("li", li, bucket_by=["l_orderkey"], n_buckets=4)
    key = 42
    q = engine.table("li").filter(
        (F.col("l_orderkey") == key) & (F.col("bucket_id") == bucket_expr(["l_orderkey"], 4))
    )
    plan = plan_of(q)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "bucket_id" in seg
    # and it returns exactly the rows for that key
    want = li.filter(F.col("l_orderkey") == key).count()
    assert q.count() == want


def test_embedding_cosine_no_nested_loop(spark, sf_dir):
    """dedup_embedding_cosine must be a shuffled EQUI-join on the block
    grid — never BroadcastNestedLoopJoin / CartesianProduct (r1 VERDICT
    'What's wrong' #3)."""
    df = all_queries()["dedup_embedding_cosine"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quadratic_baselines_guarded(spark, sf_dir):
    """The all-pairs baselines refuse oversized inputs instead of silently
    going quadratic at scale."""
    import pytest

    from polars_lake_spark.operators.dedup import ngram_jaccard_pairs
    from polars_lake_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="cosine_pairs_blocked"):
        cosine_pairs(emb, max_rows=10)
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(docs, "doc_id", "text", max_rows=10)


def test_upsert_partitioned_scans_only_touched(spark, tmp_path):
    """The merge's old-side scan is restricted by a partition semi join —
    it must not read untouched partitions."""
    rows = [(i, i % 5, i * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, p int, v int")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("t", df, partition_by=["p"], keys=["k"])
    # batch touches only partition p=2
    batch = spark.createDataFrame([(2, 2, 999), (7, 2, 999)], "k int, p int, v int")
    engine.upsert("t", batch)
    got = engine.table("t")
    assert got.count() == 100
    assert {r.v for r in got.filter(F.col("k").isin(2, 7)).collect()} == {999}


def test_q6_scan_agg_pushdown(spark, sf_dir):
    """Q6 is the canonical pushdown query: discount/quantity predicates
    must reach the Parquet scan, and the single-row aggregate must be a
    map-side partial."""
    df = all_queries()["q6_forecast_revenue"].fn(spark, sf_dir)
    plan = formatted(df)
    pushed = [seg.split("\n")[0] for seg in plan.split("PushedFilters: ")[1:]]
    assert any("l_discount" in s and "l_quantity" in s for s in pushed), pushed
    assert "partial_sum" in plan_of(df)
    # only the 4 referenced columns are read
    rs = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_orderkey" not in rs and "l_extendedprice" in rs


def test_q8_broadcasts_all_dims(spark, sf_dir):
    """Six-table star: supplier + both nation scans + region ride
    broadcast joins; the fact-side joins never broadcast lineitem."""
    df = all_queries()["q8_market_share"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    """EXISTS must compile to a LeftSemi hash join, not a fan-out join +
    dedup."""
    plan = plan_of(all_queries()["q4_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_scalar_threshold_is_broadcast_not_collect(spark, sf_dir):
    """Q11/Q15/Q22-style scalar thresholds attach via a broadcast
    1-row cross join — one distributed plan, no driver round-trip."""
    for name in ("q11_important_parts", "q15_top_supplier", "q22_idle_customers"):
        plan = plan_of(all_queries()[name].fn(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, name


def test_ivf_assignment_is_map_side(spark, sf_dir):
    """The literal-centroid assignment adds NO shuffle: assigning cells to
    the corpus is exchange-free past the quantizer training."""
    from polars_lake_spark.operators.ivf import _assign, train_ivf
    from polars_lake_spark.operators.similarity import as_double, norm

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf(emb, k=4, iters=1)
    vecs = emb.select(
        F.col("vec_id").alias("id"), as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    plan = plan_of(_assign(vecs, cents))
    assert "Exchange" not in plan


def test_chunking_and_quantize_are_map_side(spark, sf_dir):
    """The chunker and int8 quantizer must stay shuffle-free and UDF-free:
    pure narrow transforms over the scan (the property that makes them
    embarrassingly parallel at 100 TB)."""
    for name in ("chunk_documents", "embedding_quantize"):
        df = all_queries()[name].fn(spark, sf_dir)
        plan = plan_of(df)
        assert "Exchange" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_boilerplate_shuffles_hashes_not_text(spark, sf_dir):
    """boilerplate_chunks aggregates on the md5 fingerprint: the pre-shuffle
    projection must carry fp but never the chunk text."""
    df = all_queries()["boilerplate_chunks"].fn(spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "partial_count" in plan  # map-side partial agg before the shuffle
    assert "chunk_text" not in plan.split("Exchange")[1]


def test_dedup_survivors_anti_join_broadcasts(spark, sf_dir):
    df = all_queries()["dedup_survivors"].fn(spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_partition_pruning_survives_offload(spark, sf_dir, tmp_path, tmp_path_factory):
    """Reads through root_override are ordinary parquet scans: partition
    pruning (and thus bucket pruning) is identical after offload_table."""
    li = load_table(spark, sf_dir, "lineitem")
    engine = Engine(spark, str(tmp_path))
    engine.create_table(
        "li2", li, partition_by=["l_returnflag"], bucket_by=["l_orderkey"], n_buckets=4
    )
    engine.offload_table("li2", str(tmp_path_factory.mktemp("cold_plan")))
    q = engine.table("li2").filter(F.col("l_returnflag") == "A")
    from polars_lake_spark.plans import plan_report

    report = plan_report(q)
    assert any("l_returnflag" in p for p in report["partition_filters"])
    assert "cold_plan" in plan_of(q)  # the scan really reads the cold tier


def test_heavy_hitters_topk_broadcasts_candidates(spark, sf_dir):
    """token_heavy_hitters' second pass must probe the exploded token
    stream with a BROADCAST semi join on the sketch candidates — a
    sort-merge join would shuffle the whole token stream, defeating the
    sketch."""
    df = all_queries()["token_heavy_hitters"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_windows_share_one_exchange(spark, sf_dir):
    """The row-number window and the 20-row frame window both partition
    by user_id — the plan must reuse ONE exchange, not shuffle twice."""
    plan = plan_of(all_queries()["events_ewma"].fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    plan = plan_of(all_queries()["events_anomaly_zscore"].fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_hot_keys_broadcasts_candidates(spark, sf_dir):
    """The hot-key probe's exact pass must be candidate-broadcast — a
    sort-merge join would shuffle the full key column it exists to
    avoid."""
    plan = plan_of(all_queries()["skew_hot_keys"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_prefix_join_all_equi_joins(spark, sf_dir):
    """dedup_prefix_join is exact WITHOUT quadratic physics: candidate
    generation and verification must all be equi-joins (token / id keys)
    — never BroadcastNestedLoopJoin / CartesianProduct."""
    df = all_queries()["dedup_prefix_join"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_semantic_broadcasts_bench(spark, sf_dir):
    """The benchmark side must broadcast (eval suites are the small side
    by construction) and the corpus must not shuffle: the only join is
    the broadcast anti fold."""
    df = all_queries()["decontaminate_semantic"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin BuildRight, LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bloom_semi_join_prefilter_is_map_side(spark, sf_dir):
    """The bloom prefilter must be a broadcast of the ONE-ROW bitmap plus
    a map-side Filter — no shuffle (SortMergeJoin/Exchange of the fact
    table) before the exact semi-join, and never a CartesianProduct of
    anything larger than the bitmap row."""
    df = all_queries()["bloom_semi_join"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row bitmap
    assert "LeftSemi" in plan


def test_replace_where_scan_partition_prunes(spark, sf_dir, tmp_path):
    """The partition-scoped DML rewrite must PRUNE its read: the kept
    slice restricted via _prune_to_touched compiles to a literal
    PartitionFilters entry at the scan — a semi join would scan every
    partition just to rewrite one (the 100 TB point of replace_where)."""
    li = load_table(spark, sf_dir, "lineitem")
    engine = Engine(spark, str(tmp_path))
    engine.create_table("liw", li, partition_by=["l_returnflag"])
    t = engine.table("liw")
    kept = t.filter(~((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 5)))
    touched = spark.createDataFrame([("R",)], "l_returnflag string")
    pruned = engine._prune_to_touched(kept, touched, ["l_returnflag"])
    plan = plan_of(pruned)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "l_returnflag" in seg and seg.strip(": [") != ""

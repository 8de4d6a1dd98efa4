"""Training-set assembly operators (operators/splits.py): determinism
under repartitioning, split/shard invariants, SemDeDup keep rule, and the
sharded export's on-disk layout."""

import pytest
from pyspark.sql import functions as F

from polars_lake_spark.operators import splits as SP
from polars_lake_spark.sources import load_table


def test_split_assign_partitions_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = SP.split_assign(docs, "text").select("doc_id", "split")
    b = SP.split_assign(docs.repartition(7), "text").select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    # 96/2/2 content-hash split: train dominates, nothing unassigned.
    assert counts.get("train", 0) > 0.8 * total
    assert "unassigned" not in counts


def test_split_assign_duplicate_content_same_split(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["id", "t"]
    )
    rows = SP.split_assign(df, "t").select("id", "split").collect()
    by_id = {r["id"]: r["split"] for r in rows}
    assert by_id[1] == by_id[2]  # exact dupes can never straddle a split


def test_split_assign_validates():
    with pytest.raises(ValueError):
        SP.split_assign(None, "t", {"train": 60, "val": 60})
    with pytest.raises(ValueError):
        SP.split_assign(None, "t", {"train": -1})


def test_split_assign_partial_percentages_label_unassigned(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(200)], ["id", "t"])
    out = SP.split_assign(df, "t", {"a": 10, "b": 10})
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert "unassigned" in labels  # rows past the ranges are visible, not lost


def test_shard_assign_is_a_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SP.shard_assign(docs, "doc_id", num_shards=4, seed="x")
    n = docs.count()
    assert out.count() == n
    # Positions within each shard are exactly 0..count-1 (dense, no gaps).
    per = out.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    ).collect()
    assert len(per) == 4
    for r in per:
        assert (r["lo"], r["hi"], r["nd"]) == (0, r["n"] - 1, r["n"])


def test_shard_assign_seed_changes_order_not_membership_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = SP.shard_assign(docs, "doc_id", 4, seed="s1")
    b = SP.shard_assign(docs, "doc_id", 4, seed="s2")
    pa = sorted(map(tuple, a.select("doc_id", "shard_id", "pos").collect()))
    pb = sorted(map(tuple, b.select("doc_id", "shard_id", "pos").collect()))
    assert pa != pb  # a different seed is a different shuffle
    # same seed reproduces exactly, regardless of input partitioning
    c = SP.shard_assign(docs.repartition(11), "doc_id", 4, seed="s1")
    pc = sorted(map(tuple, c.select("doc_id", "shard_id", "pos").collect()))
    assert pa == pc


def test_shard_assign_validates():
    with pytest.raises(ValueError):
        SP.shard_assign(None, "id", 0)


def test_length_bucket_batches_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SP.length_bucket_batches(docs, "doc_id", "n_chars",
                                   bucket_width=32, batch_size=16)
    bad = out.filter(
        (F.col("bucket") != F.floor(F.col("n_chars") / 32))
        | (F.col("pos_in_batch") < 0) | (F.col("pos_in_batch") >= 16)
    ).count()
    assert bad == 0
    # every batch except possibly the last per bucket is exactly full
    sizes = out.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("batch_id").alias("mb")).collect()
    last = {}
    for r in sizes:
        last[r["bucket"]] = max(last.get(r["bucket"], -1), r["batch_id"])
    for r in sizes:
        if r["batch_id"] != last[r["bucket"]]:
            assert r["n"] == 16


def test_length_bucket_batches_validates():
    with pytest.raises(ValueError):
        SP.length_bucket_batches(None, "id", "n", bucket_width=0)
    with pytest.raises(ValueError):
        SP.length_bucket_batches(None, "id", "n", batch_size=0)


def test_semdedup_keep_rule(spark):
    # cluster 1: ids 10,11 identical (11 dropped), 12 orthogonal (kept);
    # cluster 2: 20 alone (kept); identical-to-10 but other cluster → kept.
    rows = [
        (10, 1, [1.0, 0.0]),
        (11, 1, [1.0, 0.0]),
        (12, 1, [0.0, 1.0]),
        (20, 2, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["id", "c", "v"])
    out = {r["id"]: r["is_kept"]
           for r in SP.semdedup(df, "id", "v", "c", threshold=0.9).collect()}
    assert out == {10: True, 11: False, 12: True, 20: True}


def test_semdedup_earliest_id_always_kept(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = SP.semdedup(emb, "vec_id", "embedding", "label", threshold=0.30)
    firsts = out.groupBy("label").agg(F.min("vec_id").alias("m"))
    joined = out.join(firsts, (out.vec_id == firsts.m) & (out.label == firsts.label))
    assert joined.filter(~F.col("is_kept")).count() == 0


def test_weighted_hash_sample_rates_track_weight(spark):
    from polars_lake_spark.operators.sampling import weighted_hash_sample
    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(2000)], ["id", "t"]
    )
    none = weighted_hash_sample(df, "t", F.lit(0.0)).count()
    all_ = weighted_hash_sample(df, "t", F.lit(1.0)).count()
    half = weighted_hash_sample(df, "t", F.lit(0.5)).count()
    assert none == 0 and all_ == 2000
    assert 800 < half < 1200  # md5 buckets ~uniform
    # deterministic: same inputs, same survivors
    a = sorted(r["id"] for r in weighted_hash_sample(df, "t", F.lit(0.3)).collect())
    b = sorted(r["id"] for r in
               weighted_hash_sample(df.repartition(13), "t", F.lit(0.3)).collect())
    assert a == b


def test_decontaminate_exact_drops_synthetic_dupes(spark):
    """The oracled query's corpus has no exact cross-boundary dupes;
    prove the drop path on a frame where they exist."""
    from polars_lake_spark.functions import text as TX
    rows = [(0, "the shared benchmark doc"), (50, "another bench doc"),
            (1, "THE  shared benchmark DOC"),  # normalizes equal to doc 0
            (2, "unique training doc")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = F.md5(TX.normalized(F.col("text")).cast("binary"))
    with_fp = docs.select("doc_id", fp.alias("fp"))
    bench = with_fp.filter(F.col("doc_id") % 50 == 0).select("fp").distinct()
    train = with_fp.filter(F.col("doc_id") % 50 != 0)
    kept = train.join(F.broadcast(bench), on="fp", how="left_anti")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2]


def test_write_training_shards_layout_and_determinism(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out1 = str(tmp_path / "shards1")
    man1 = SP.write_training_shards(docs, "doc_id", out1, num_shards=4, seed="e")
    m1 = sorted(map(tuple, man1.collect()))
    files = SP.list_shard_files(out1)
    assert sorted(files) == [0, 1, 2, 3]
    assert all(fs for fs in files.values())
    # manifest totals reconcile with the source
    assert sum(r[1] for r in m1) == docs.count()
    # reading one shard directory prunes to that shard only
    one = spark.read.parquet(out1 + "/shard_id=0")
    assert one.count() == [r[1] for r in m1 if r[0] == 0][0]
    # in-file order is the training order (pos ascending as written)
    pos = [r["pos"] for r in one.select("pos").collect()]
    assert pos == sorted(pos)
    # a second export of the same data is byte-identical in assignment
    out2 = str(tmp_path / "shards2")
    man2 = SP.write_training_shards(docs, "doc_id", out2, num_shards=4, seed="e")
    assert m1 == sorted(map(tuple, man2.collect()))


def test_write_training_shards_max_records_per_file(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = str(tmp_path / "small")
    SP.write_training_shards(docs, "doc_id", out, num_shards=2, seed="e",
                             max_records_per_file=50)
    files = SP.list_shard_files(out)
    # 1000 docs / 2 shards / 50-row cap → every shard splits into many files
    assert all(len(fs) >= 2 for fs in files.values())
    for sid, fs in files.items():
        for f in fs:
            cnt = spark.read.parquet(f"{out}/shard_id={sid}/{f}").count()
            assert cnt <= 50


def test_pack_sequences_ffd_matches_model(spark):
    """FFD assignment equals the Python model exactly (incl. oversize and
    budget-exact docs) and is identical under repartitioning."""
    from polars_lake_spark.operators.sampling import pack_sequences_ffd
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate([700, 512, 300, 300, 200, 120, 90, 60, 30, 10, 5, 1])]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")

    def model(items, budget):
        items = sorted(items, key=lambda r: (-r[1], r[0]))
        rem, out = [], {}
        for i, t in items:
            placed = -1
            if t < budget:
                for bi, room in enumerate(rem):
                    if room >= t:
                        placed = bi
                        break
            if placed < 0:
                rem.append(max(budget - t, 0))
                placed = len(rem) - 1
            else:
                rem[placed] -= t
            out[i] = placed
        return out

    budget, shards = 512, 2
    got = {
        r.doc_id: (r.shard, r.pack_id)
        for r in pack_sequences_ffd(
            df, "doc_id", F.col("tokens"), budget, n_shards=shards
        ).collect()
    }
    want = {}
    for s in range(shards):
        items = [(i, t) for i, t in rows if i % shards == s]
        for i, p in model(items, budget).items():
            want[i] = (s, p)
    assert got == want
    got2 = {
        r.doc_id: (r.shard, r.pack_id)
        for r in pack_sequences_ffd(
            df.repartition(7), "doc_id", F.col("tokens"), budget, n_shards=shards
        ).collect()
    }
    assert got2 == got
    # no multi-doc pack over budget
    from collections import defaultdict
    totals = defaultdict(list)
    for i, t in rows:
        totals[got[i]].append(t)
    for pack, ts in totals.items():
        if len(ts) > 1:
            assert sum(ts) <= budget, (pack, ts)


def test_pack_sequences_ffd_null_and_negative_tokens(spark):
    """NULL / negative token counts (size(NULL) = -1 upstream) clamp to
    zero-width docs: they pack without crashing the fold or inflating a
    pack's capacity."""
    from polars_lake_spark.operators.sampling import pack_sequences_ffd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 100), (1, None), (2, -1), (3, 500)],
        "doc_id long, tokens long",
    )
    got = {
        r.doc_id: (r.tokens, r.shard, r.pack_id)
        for r in pack_sequences_ffd(
            df, "doc_id", F.col("tokens"), budget=512, n_shards=1
        ).collect()
    }
    assert len(got) == 4
    assert got[1][0] == 0 and got[2][0] == 0  # clamped
    # capacity accounting intact: 500 and 100 cannot share a pack
    assert got[0][2] != got[3][2]


def test_weighted_sample_k_matches_python_model(spark):
    """A-ES top-k must equal the direct python computation of the same
    ln(md5-uniform)/weight ranking, and be layout-independent."""
    import hashlib
    import math

    from polars_lake_spark.operators.sampling import weighted_sample_k

    rows = [(i, "g%d" % (i % 3), float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, grp string, w double")

    def key(i, w):
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return math.log((v + 0.5) / float(1 << 60)) / w

    expect = set()
    for g in {"g0", "g1", "g2"}:
        members = [(key(i, w), i) for i, gg, w in rows if gg == g]
        members.sort(key=lambda t: (-t[0], t[1]))
        expect |= {i for _k, i in members[:5]}

    got = {
        r.id for r in weighted_sample_k(df, "grp", "id", "w", 5).collect()
    }
    assert got == expect
    rep = {
        r.id
        for r in weighted_sample_k(
            df.repartition(7), "grp", "id", "w", 5
        ).collect()
    }
    assert rep == expect


def test_weighted_sample_k_rates_track_weight(spark):
    """Across many disjoint groups, a row with 9x the weight of its four
    peers must be selected (k=1) far more often than 1-in-5."""
    from polars_lake_spark.operators.sampling import weighted_sample_k

    rows = []
    for g in range(200):
        for m in range(5):
            rows.append((g * 10 + m, "g%d" % g, 9.0 if m == 0 else 1.0))
    df = spark.createDataFrame(rows, "id bigint, grp string, w double")
    picked = weighted_sample_k(df, "grp", "id", "w", 1).collect()
    heavy = sum(1 for r in picked if r.id % 10 == 0)
    # P(heavy) = 9/13 ≈ 0.69; with 200 groups, [0.5, 0.9] is a >6-sigma band
    assert len(picked) == 200
    assert 100 <= heavy <= 180, heavy

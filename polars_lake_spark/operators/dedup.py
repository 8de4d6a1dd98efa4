"""Deduplication operators for large-scale text corpora.

Beyond the reference's planned `drop_duplicates`
(``/root/reference/src/main.rs:32``), these are the training-data-pipeline
dedup family, each built shuffle-consciously:

* exact          — fingerprint group-by (one shuffle on the hash)
* n-gram Jaccard — exact pairwise via shingle self-join (the quadratic
                   baseline; use on bounded slices)
* MinHash + LSH  — shingle → signature → band buckets → candidate pairs →
                   exact verification.  The scale path: cost is
                   O(docs × perms) map-side + a shuffle on band keys whose
                   fan-out is bounded by bucket sizes, never all-pairs.
* SimHash        — 48-bit signature; banded buckets → hamming verification.

All are pure column expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NORM_PATTERN = r"\s+"


def normalized_text(col):
    """lower + whitespace collapse + trim — shared by every dedup flavor."""
    return F.trim(F.regexp_replace(F.lower(col), NORM_PATTERN, " "))


def let_bound(value, body):
    """Let-binding for an expensive sub-expression: evaluate ``value``
    ONCE per row, pass it to ``body`` as a lambda variable.

    Catalyst's CollapseProject inlines a projected alias into EVERY
    downstream reference regardless of cost, so an expression that
    references an expensive array N times recomputes it N times.  A
    higher-order-function lambda variable is evaluated exactly once —
    the column-expression equivalent of ``let`` (measured 3.5× on
    minhash signatures, 82× on winnowing's sliding-window mins)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def parallelize_for_cpu(df: DataFrame) -> DataFrame:
    """Spread CPU-bound per-row work across the cluster when the input
    arrives under-partitioned (a small parquet file reads as ONE task, so
    shingling/hashing serializes on a single core — measured 2× on the
    minhash pipeline). No-op when partitions ≥ defaultParallelism, which
    is the normal state for at-scale inputs."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, words, shingles) with distinct word n-gram shingles; documents
    with fewer than n words are excluded (no shingle is defined)."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    df = parallelize_for_cpu(df)
    df = df.select(F.col(id_col).alias("id"), words.alias("words")).filter(
        F.size("words") >= n
    )
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("words") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("words"), i + j) for j in range(n)]
            ),
        )
    )
    return df.select("id", shingles.alias("shingles"))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized content,
    with group size and the deterministic survivor (min id)."""
    fp = F.md5(normalized_text(F.col(text_col)).cast("binary"))
    return (
        df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keeper_id"))
    )


def _exploded_shingles(shingled: DataFrame) -> DataFrame:
    return shingled.select("id", F.explode("shingles").alias("shingle"))


def _jaccard_from_common(common: DataFrame, sizes: DataFrame) -> DataFrame:
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    return (
        common.join(s1, common.d1 == F.col("s1.id"))
        .join(s2, common.d2 == F.col("s2.id"))
        .select(
            "d1",
            "d2",
            (
                F.col("common")
                / (F.col("s1.n") + F.col("s2.n") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_rows: int = 100_000,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold via shingle self-join.

    Quadratic in per-shingle document frequency — correct everywhere,
    affordable on bounded corpora; MinHash below is the 100 TB variant.
    ``max_rows`` guards against silent invocation at scale.
    """
    n_docs = df.count()
    if n_docs > max_rows:
        raise ValueError(
            f"ngram_jaccard_pairs is the quadratic shingle self-join baseline; "
            f"input has {n_docs} rows > max_rows={max_rows}. Use "
            f"minhash_lsh_pairs() (banded LSH, ~1 recall at the threshold) at scale."
        )
    # The exploded shingle set feeds three branches (sizes + both join
    # sides); persist so the normalize/split/explode subtree runs once.
    # MEMORY_AND_DISK: spills instead of OOM at large SF.
    from pyspark.storagelevel import StorageLevel

    sh = _exploded_shingles(word_shingles(df, id_col, text_col, n)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    j = _jaccard_from_common(common, sizes)
    return j.filter(F.col("jaccard") >= threshold)


def _minhash_signatures_expr(
    shingled: DataFrame, num_perm: int = 128
) -> DataFrame:
    """Pure-column-expression signature path (pre-r14 default, kept as
    the equality witness for the Arrow path): sig[i] = min over shingles
    of xxhash64(base, i).

    One nested higher-order expression instead of num_perm unrolled
    branches: same hash values (xxhash64(h, i) with i an int element ==
    xxhash64(h, lit(i))), but the expression tree is O(1) in num_perm.
    base_h is let-bound so the shingle array hashes once, not 128×.
    """

    def sig_of(base_h):
        return F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: F.array_min(
                F.transform(base_h, lambda h: F.xxhash64(h, i))
            ),
        )

    base = F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    return shingled.select(
        "id", F.col("shingles"), let_bound(base, sig_of).alias("sig")
    )


def minhash_signatures(
    shingled: DataFrame, num_perm: int = 128
) -> DataFrame:
    """(id, sig) where sig[i] = min over shingles of xxhash64(base, i) —
    BIT-IDENTICAL to :func:`_minhash_signatures_expr` (equality-tested,
    tests/test_arrow_udfs.py), but the num_perm × shingles re-hash runs
    as vectorized numpy inside an Arrow-batched pandas UDF instead of an
    interpreted higher-order expression (guide §4.2: nested HOF lambdas
    never enter whole-stage codegen; measured 1.74 s → 1.48 s for the
    full signature pass at sf0.1 — the win grows with corpus size since
    the per-row Python overhead is amortized over bigger Arrow batches
    while the interpreted-expression cost stays per-element).

    Split of labor: each shingle STRING is hashed once in the JVM
    (``xxhash64`` over variable-length UTF-8 — cheap, O(shingles)), and
    only the resulting long array crosses the Arrow boundary (§4.1: ship
    the 8-byte proxy, not the text).  Python re-derives
    ``xxhash64(h, i)`` = XXH64_int(i, seed=XXH64_long(h, 42)) with the
    published XXH64 constants, exactly Spark's seed-chaining for a
    two-column hash, then takes per-perm signed mins
    (operators/_arrow_udfs.py)."""
    from polars_lake_spark.operators._arrow_udfs import make_minhash_sig_udf

    base = F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    return shingled.select(
        "id",
        F.col("shingles"),
        make_minhash_sig_udf(num_perm)(base).alias("sig"),
    )


def minhash_band_entries(
    sigs: DataFrame, num_perm: int = 128, bands: int = 32
) -> DataFrame:
    """(id, band, bh) LSH bucket keys from (id, sig) signatures — the
    persistable index representation.  Map-side only: one row per
    (doc, band); docs sharing any (band, bh) are candidate near-dups."""
    r = num_perm // bands
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice("sig", b * r + 1, r)).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    return (
        sigs.select("id", F.explode(entries).alias("e"))
        .select("id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    )


def verified_jaccard_pairs(
    cands: DataFrame, s1: DataFrame, s2: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over candidate (d1, d2) pairs.  The candidate set is
    small (band-bucket collisions), so broadcast it against the shingle
    ARRAYS and intersect in-place — no re-explode, no extra shuffle of the
    full shingle relation.  ``s1``/``s2`` carry (d1, sh1) / (d2, sh2)."""
    verified = (
        s1.join(F.broadcast(cands), "d1")
        .join(s2, "d2")
        .withColumn("common", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh1") + F.size("sh2") - F.col("common")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select("d1", "d2", "jaccard")


def prepare_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """(shingled, band_entries) for a document slice — the two relations
    every MinHash flavor (whole-corpus or incremental) consumes.
    ``shingled`` is persisted: it feeds both the signature path and exact
    verification."""
    from pyspark.storagelevel import StorageLevel

    shingled = word_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    entries = minhash_band_entries(
        minhash_signatures(shingled, num_perm), num_perm, bands
    )
    return shingled, entries


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash banding → candidate pairs → exact Jaccard verification.

    With r = num_perm/bands = 4 rows per band, a pair at the 0.8 threshold
    is missed with probability (1-0.8^4)^32 ≈ 5e-8 — effectively exact
    recall, so the verified output equals the exact-Jaccard result while
    scaling as O(docs) + candidate volume instead of all-pairs.

    ``max_bucket`` (None = exact, the oracle semantics) caps the bucket
    fan-out: a band bucket holding B docs expands to B² candidate pairs,
    and at corpus scale a boilerplate flood that slipped past exact dedup
    turns one hot bucket into the whole job's runtime.  Buckets above the
    cap are dropped — pairs inside them are near-identical floods better
    handled by exact dedup, and each pair has bands-1 more chances to
    surface through a non-flooded bucket."""
    shingled, entries = prepare_docs(df, id_col, text_col, n, num_perm, bands)
    buckets = (
        entries.groupBy("band", "bh")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    cands = (
        buckets.select(F.explode("ids").alias("d1"), F.col("ids"))
        .select("d1", F.explode("ids").alias("d2"))
        .filter(F.col("d1") < F.col("d2"))
        .distinct()
    )

    s1 = shingled.select(F.col("id").alias("d1"), F.col("shingles").alias("sh1"))
    s2 = shingled.select(F.col("id").alias("d2"), F.col("shingles").alias("sh2"))
    return verified_jaccard_pairs(cands, s1, s2, threshold)


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 48,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """(id, simhash) — per-word hash, per-bit ±1 majority vote.

    48 bits keeps every shift inside a positive signed 64-bit literal; the
    per-bit sums are one grouped aggregation (explode on words, map-side
    partial agg).

    word_hash='xxhash64' (default) is the fast whole-stage-codegen JVM
    hash — the production path (r5: default flipped from md5; the md5
    string pipeline was the single most compute-bound expression in the
    bench).  word_hash='md5' takes a 60-bit value from md5's first 15 hex
    chars — bit-identical in ANY engine with md5, which is what makes the
    operator oracle-checkable; the oracled registry query pins it
    explicitly."""
    assert bits <= 60, "md5-derived word hash provides 60 bits"
    df = parallelize_for_cpu(df)
    words = F.split(normalized_text(F.col(text_col)), " ")
    if word_hash == "md5":
        h = F.conv(
            F.substring(F.md5(F.col("w").cast("binary")), 1, 15), 16, 10
        ).cast("long")
    else:
        h = F.xxhash64("w")
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(words).alias("w")
    ).withColumn("h", h)
    votes = exploded.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return votes.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 48,
    band_bits: int = 12,
    max_hamming: int = 3,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature (docs sharing any
    band become candidates — by pigeonhole a pair within max_hamming always
    shares a clean band when bands > max_hamming, so the banded result
    EQUALS the all-pairs result), verify with bit_count."""
    from pyspark.storagelevel import StorageLevel

    n_bands = bits // band_bits
    assert n_bands > max_hamming, "need more bands than allowed hamming distance"
    # The signature aggregation (explode + 48 per-bit sums) feeds three
    # branches (band buckets, both verification sides); persist so it
    # runs once — same contract as prepare_docs' persisted shingles
    # (lazy registry callers accept the session-lifetime cache).
    sigs = simhash_signatures(df, id_col, text_col, bits, word_hash).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    mask = (1 << band_bits) - 1
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = (
        sigs.select("id", F.explode(band_entries).alias("e"))
        .select("id", "e.band", "e.bv")
        .groupBy("band", "bv")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cands = (
        buckets.select(F.explode("ids").alias("d1"), F.col("ids"))
        .select("d1", F.explode("ids").alias("d2"))
        .filter(F.col("d1") < F.col("d2"))
        .distinct()
    )
    s1 = sigs.select(F.col("id").alias("d1"), F.col("simhash").alias("h1"))
    s2 = sigs.select(F.col("id").alias("d2"), F.col("simhash").alias("h2"))
    return (
        cands.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering (the
    SSJoin/PPJoin family: Chaudhuri et al. ICDE'06, Xiao et al. WWW'08).

    The deterministic complement to ``minhash_lsh_pairs``: output is
    provably IDENTICAL to the brute-force shingle self-join — no recall
    argument needed — while never materializing all shared-shingle pairs:

    * one aggregation computes each shingle's document frequency;
    * each document's shingle set is canonically ordered rarest-first
      (by ``(df, shingle)`` — a global total order), and only its PREFIX
      of ``|x| - ceil(t·|x|) + 1`` shingles enters the candidate join.
      Any pair with J ≥ t shares ≥ ceil(t·|x|) shingles, and the
      globally-smallest shared shingle must sit inside BOTH prefixes
      (pigeonhole: all other shared shingles order after it), so no true
      pair can be missed;
    * the size filter t·|x| ≤ |y| (both directions) prunes
      length-incompatible candidates before verification;
    * exact Jaccard verification over the surviving pairs (shared with
      the LSH path).

    Scale shape: frequent shingles — boilerplate — sort to the SUFFIX and
    never generate candidates, so candidate volume is governed by
    rare-shingle collisions (the plausibly-similar pairs), not by
    hot-shingle document frequency.  Shuffles: shingle df agg, df join,
    per-doc re-agg, candidate equi-join — all keyed, none all-pairs.

    Float-safety: ceil/threshold comparisons subtract 1e-9 so binary
    representation error (0.8·25 → 20.000000000000004) can only LENGTHEN
    a prefix / loosen the size filter, never lose a true pair.
    """
    from pyspark.storagelevel import StorageLevel

    shingled = word_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ex = _exploded_shingles(shingled)
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(dfreq, "shingle")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("os"))
    )
    npref = (
        F.size("os") - F.ceil(F.lit(threshold) * F.size("os") - F.lit(1e-9)) + 1
    )
    # pref feeds BOTH sides of the candidate self-join: persist, or the
    # shingle→df→sort subtree executes twice (same lesson as the minhash
    # signature path).
    pref = ordered.select(
        "id",
        F.size("os").alias("sz"),
        F.explode(
            F.transform(F.slice("os", F.lit(1), npref), lambda s: s["shingle"])
        ).alias("tok"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = pref.alias("a"), pref.alias("b")
    thr = F.lit(threshold) - F.lit(1e-9)
    cands = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") * thr <= F.col("b.sz"))
            & (F.col("b.sz") * thr <= F.col("a.sz")),
        )
        .select(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
        .distinct()
    )
    s1 = shingled.select(F.col("id").alias("d1"), F.col("shingles").alias("sh1"))
    s2 = shingled.select(F.col("id").alias("d2"), F.col("shingles").alias("sh2"))
    return verified_jaccard_pairs(cands, s1, s2, threshold)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    partitions: int | None = None,
    with_total: bool = False,
):
    """0-based global rank under the total order ``order_cols`` WITHOUT a
    single-task sort (the naive ``row_number() OVER (ORDER BY ...)``
    plans one partition and dies at scale):

    * range-repartition + sort within partitions (the distributed sort
      Spark already does for orderBy — but kept partitioned);
    * per-partition row counts → prefix-sum offsets on the driver (a
      collect bounded by the partition COUNT, not the data);
    * a map-side running counter adds the offset — no further shuffle.

    The input is localCheckpoint-ed after range partitioning so the two
    passes (count, assign) see identical partition bounds.  ``order_cols``
    must be a TOTAL order (include a unique id) or ranks within ties are
    partition-layout-dependent.
    """
    import pandas as pd  # noqa: F401

    spark = df.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["c"]
        for r in rp.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType — .add() would MUTATE rp's cached schema object
    out_schema = StructType(
        list(rp.schema.fields) + [StructField("__rank", LongType())]
    )

    def assign(batches):
        counter = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if counter is None:
                counter = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.copy()
            pdf["__rank"] = range(counter, counter + len(pdf))
            counter += len(pdf)
            yield pdf

    out = rp.mapInPandas(assign, out_schema).drop("__pid")
    # acc is the exact row count, already paid for by the offsets pass —
    # callers needing it (equi-depth bucketing) skip a second full scan
    return (out, acc) if with_total else out


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 10,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Sorted-neighborhood dedup (SNM, Hernandez & Stolfo SIGMOD'95):
    rank all documents under (normalized_text, id), compare each doc only
    to its next ``window-1`` neighbors, exact-verify Jaccard.

    The fifth point in the dedup design space: O(docs · window)
    comparisons with recall concentrated on near-dups that share a sort
    prefix — the classic cheap pass before LSH.  Deterministic end to
    end (total sort order, exact verification), so DuckDB replays it
    exactly.  Scale shape: the distributed ``global_rank`` (no
    single-task sort), one keyed self-join on rank, broadcast-verified
    candidates.
    """
    from pyspark.storagelevel import StorageLevel

    shingled = word_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    base = df.select(
        F.col(id_col).alias("id"),
        normalized_text(F.col(text_col)).alias("__norm"),
    ).join(shingled.select("id"), "id")
    ranked = global_rank(base, ["__norm", "id"]).select("id", "__rank")
    a = ranked.select(F.col("id").alias("d1"), F.col("__rank").alias("ra"))
    b = ranked.select(F.col("id").alias("d2"), F.col("__rank").alias("rb"))
    probes = a.select(
        "d1",
        F.explode(
            F.array(*[F.col("ra") + F.lit(j) for j in range(1, window)])
        ).alias("rb"),
    )
    cands = probes.join(b, "rb").select("d1", "d2")
    s1 = shingled.select(F.col("id").alias("d1"), F.col("shingles").alias("sh1"))
    s2 = shingled.select(F.col("id").alias("d2"), F.col("shingles").alias("sh2"))
    return verified_jaccard_pairs(cands, s1, s2, threshold)

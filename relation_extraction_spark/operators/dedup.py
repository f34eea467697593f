"""Document deduplication for large-scale training-data pipelines.

Variants (each a first-class operator with a driver oracle where SQL can
express it):

* exact         — hash-groupBy on normalized text; keep min doc_id.
* minhash_lsh   — word-shingle MinHash → banded LSH buckets → candidate pairs
                  → n-gram Jaccard verify. Deterministic hashing via
                  crc32(seed || shingle): reproducible across cluster sizes,
                  mirrorable in ANSI SQL (no MLlib model state).
* simhash       — 64-bit simhash from md5(token) bit votes; near-dup if
                  Hamming distance <= k (bucketed by 4 16-bit bands so the
                  join is band-equi, not cartesian).
* ngram_jaccard — direct pairwise Jaccard over candidate pairs.

All shuffles key on (band, bucket) or hash values — uniform, skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# one-time flag for the ngram_jaccard_pairs max_df exactness-loss warning
_WARNED_MAX_DF_DROP = False

_norm = lambda c: F.lower(F.regexp_replace(c, "\\s+", " "))  # noqa: E731


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small inputs often arrive as ONE file = one split; per-row-heavy
    operators (shingling, hashing) would then run on a single core. At real
    scale inputs have many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per identical normalized text.

    Groups on ``md5(norm_text)`` — a 128-bit digest — instead of the
    normalized text itself: at web scale the old key shipped every
    distinct document body through the exchange; the digest shuffles 32
    bytes per row for the same grouping (collision odds ~n²/2¹²⁸ —
    negligible at any corpus size). Output unchanged: (id, dup_count)
    never surfaced the key."""
    return (
        docs.groupBy(F.md5(_norm(F.col(text_col))).alias("_k"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, "dup_count")
    )


def positional_word_grams(words, n: int):
    """All positional word n-grams of a word-array Column, built with n-1
    zip_with passes over shifted copies — O(n·L) total work — instead of a
    per-position transform+slice, whose per-element array copy is O(L²)
    and measured 2-8× slower at sf0.1. Output is element-identical to the
    naive form (differentially checked). Shared by the shingle builder and
    the curation gram builders — fix the kernel HERE, once."""
    sh = words
    for k in range(1, n):
        sh = F.zip_with(
            words if k == 1 else sh,
            F.slice(words, k + 1, F.greatest(F.size(words) - k, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.slice(sh, 1, F.size(words) - (n - 1))


def word_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles (Catalyst expression); texts shorter
    than n words contribute their whole text as one shingle."""
    words = F.split(_norm(text_col), " ")
    return F.array_distinct(
        F.when(F.size(words) >= n, positional_word_grams(words, n))
        .otherwise(F.array(F.concat_ws(" ", words)))
    )


def hashed_word_shingles(text_col, n: int = 3):
    """64-bit hashes of the distinct word n-gram shingles — equality-only
    twin of :func:`word_shingles` for consumers that never surface the
    shingle text (inverted indexes, Jaccard counting). Built as a chained
    ``xxhash64`` fold over the word array, so no n-word gram STRING is ever
    allocated and every downstream exchange carries 8 bytes per shingle.
    Short texts (< n words) fold the whole word array into one hash; a
    k<n-word fold can only collide with a true n-gram chain by hash
    accident (~2⁻⁶⁴), mirroring the string form where a <n-word join can
    never equal an n-word gram."""
    words = F.split(_norm(text_col), " ")
    h = F.transform(words, lambda w: F.xxhash64(w))
    for k in range(1, n):
        h = F.zip_with(
            h,
            F.slice(words, k + 1, F.greatest(F.size(words) - k, F.lit(1))),
            lambda a, w: F.xxhash64(a, w),
        )
    grams = F.slice(h, 1, F.size(words) - (n - 1))
    whole = F.aggregate(
        words, F.lit(None).cast("bigint"),
        lambda acc, w: F.xxhash64(acc, w))
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array(whole))
    )


def hash64(col):
    """Deterministic 60-bit hash = int(md5[:15], 16): identical in ANSI SQL
    (DuckDB: CAST('0x'||substring(md5(x),1,15) AS BIGINT)) → oracle-able."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 32, shingle_n: int = 3,
) -> DataFrame:
    """sig[k] = min over shingles of hash64(f"{k}#" + shingle).

    ONE aggregate pass with a num_hashes-wide running-min accumulator: the
    lazy shingle array is materialized once per row instead of once per hash
    (transform-over-hashes re-evaluates it — no CSE across lambda bodies;
    measured 1.8× slower at sf0.1, identical output)."""
    docs = _ensure_parallelism(docs)
    sh = word_shingles(F.col(text_col), shingle_n)
    max_long = (1 << 63) - 1
    hashes = lambda s: F.array(*[  # noqa: E731
        hash64(F.concat(F.lit(f"{k}#"), s)) for k in range(num_hashes)])
    sig = F.aggregate(
        sh, F.array_repeat(F.lit(max_long).cast("bigint"), num_hashes),
        lambda acc, s: F.zip_with(acc, hashes(s), lambda a, b: F.least(a, b)))
    return docs.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 32, bands: int = 8, shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with verified shingle-Jaccard."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(F.concat_ws(",", F.transform(
                        F.slice("sig", b * rows + 1, rows), lambda x: x.cast("string")
                    ))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
        .dropDuplicates()
    )
    # verification needs only shingle-set intersection/union SIZES — run it
    # in the 64-bit hash domain (same counts, 8-byte elements)
    t = docs.select(F.col(id_col),
                    hashed_word_shingles(F.col(text_col), shingle_n).alias("sh"))
    verified = (
        cand.join(t.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(t.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b")), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


SIMHASH_BITS = 60


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit simhash: per-token md5 → bit votes → sign. Pure Catalyst; bit
    positions are Python-int literals (shift amounts can't be Columns).

    ONE aggregate pass with a 60-int vote accumulator: the lazy md5 hash
    array is materialized exactly once per row. The naive form (60 separate
    filter/size expressions) re-evaluates the md5 hashing per bit — Catalyst
    does not CSE across sibling aggregate expressions — and measured 3×
    slower at sf0.1 with identical output."""
    docs = _ensure_parallelism(docs)
    words = F.split(_norm(F.col(text_col)), " ")
    hs = F.transform(words, lambda w: hash64(w))
    n = F.size(words)
    bits2 = lambda h: F.array(*[  # noqa: E731
        (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2).cast("int")
        for b in range(SIMHASH_BITS)])
    pow2 = F.array(*[F.lit(1 << b).cast("bigint") for b in range(SIMHASH_BITS)])
    # ONE aggregate: acc_b starts at -n and gains 2 per set bit, so the final
    # acc_b = 2·vote_b − n and acc_b > 0 ⇔ the old vote_b·2 > n — same sign
    # test in exact integers. The -n seed is the point: the previous form
    # compared votes against `n` INSIDE the final zip_with lambda, and a
    # lambda's reference to an outer subtree re-evaluates it per element —
    # 60 regex splits per row (no CSE across lambda boundaries; measured
    # ~1.5 s of simhash's 2.4 s at sf1.0). The init expression runs once per
    # row, and the finish lambda only touches the accumulator + a literal
    # array.
    sim = F.aggregate(
        hs, F.array_repeat(-n, SIMHASH_BITS),
        lambda acc, h: F.zip_with(acc, bits2(h), lambda a, v: a + v),
        lambda acc: F.aggregate(
            F.zip_with(acc, pow2,
                       lambda v, p: F.when(v > 0, p)
                       .otherwise(F.lit(0).cast("bigint"))),
            F.lit(0).cast("bigint"), lambda a, x: a + x))
    return docs.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, blocked on 15-bit bands
    (pigeonhole: distance <= 3 → at least one of 4 bands identical)."""
    s = simhash(docs, id_col, text_col)
    banded = s.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * 15).bitwiseAND(F.lit(32767)).alias("bucket"),
            )
            for b in range(4)
        ])).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["a", "b"])
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, threshold: float = 0.5, block_col: str | None = None,
    max_df: int | None = 1000,
) -> DataFrame:
    """Word-n-gram Jaccard pairs via a sparse inverted index: explode distinct
    shingles, equi-join on (block, shingle) to count common shingles per pair,
    then |A∪B| = |A| + |B| - common. Only pairs sharing ≥1 shingle are ever
    materialized — O(Σ df(shingle)²) instead of the dense O(n²·|shingles|)
    pairwise array intersection, and every shuffle keys on the shingle hash
    (uniform).

    ``max_df`` is the stop-shingle cap: shingles occurring in more than
    ``max_df`` documents (per block) are dropped from the inverted index
    BEFORE the self-join, bounding the candidate fan-out at max_df² per
    shingle — without it one boilerplate shingle shared by 10⁵ docs yields
    10¹⁰ candidate rows. Union sizes stay un-filtered, so capped jaccard is a
    lower bound of the true jaccard: pairs whose overlap is *only* ultra-
    common boilerplate may be missed; genuinely near-duplicate pairs (which
    share many sub-max_df shingles too) are unaffected. This is the standard
    stop-shingle trick for web-scale near-dup mining.

    The cap is ON by default (1000): the unbounded exact mode is quadratic in
    the hottest shingle's document frequency and must be an explicit opt-in —
    pass ``max_df=None`` to get output identical to the dense pairwise form
    (safe only when no shingle is boilerplate-common). **Breaking default
    change in round 4** (was ``None``): existing callers whose corpora have
    boilerplate shingles now get the approximate lower bound unless they
    opt back in — see COVERAGE.md release notes. When the cap actually
    drops shingles, a one-time WARNING fires (a short-circuit limit(1)
    probe over the cache-hot shingle table, skipped after the first hit),
    so exactness loss is visible at the call site instead of silent."""
    from pyspark import StorageLevel

    # hashed shingles: jaccard only needs shingle EQUALITY, so the inverted
    # index, df-cap and pair counting all run on 8-byte longs instead of
    # n-word strings (narrower shuffles, cheaper comparisons; the counts —
    # and with them jaccard — are unchanged short of a 2⁻⁶⁴ hash accident)
    t = _ensure_parallelism(docs).select(
        F.col(id_col), *([F.col(block_col)] if block_col else []),
        hashed_word_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    # The shingle table feeds sizes + the inverted index (+ df filter), so the
    # expensive shingling scan must run once, not per branch. DataFrame
    # persist() registers in the session CacheManager and is held until an
    # explicit unpersist — it would leak across repeated calls — so the
    # result is materialized to executor storage (localCheckpoint, small:
    # only the above-threshold pairs) at the end of this function and the
    # shingle cache is released before returning. ContextCleaner reclaims the
    # checkpoint blocks when the returned DataFrame's RDD is GC'd.
    t = t.persist(StorageLevel.MEMORY_AND_DISK)
    on = ([block_col] if block_col else []) + ["shingle"]
    if max_df is not None:
        # set sizes ride along with the inverted index → the pair generator
        # emits (a, b, n_a, n_b) directly and NO per-side sizes join is needed
        inv = t.select(
            F.col(id_col), F.col("n_sh"),
            *([F.col(block_col)] if block_col else []),
            F.explode("sh").alias("shingle"),
        )
        # df-count pass (map-side partial agg) → semi-join BEFORE any posting
        # list is materialized, so a boilerplate shingle in 10⁵ docs never
        # builds a 10⁵-element row or a 10¹⁰-row join fan-out
        keep = (
            inv.groupBy(*on).agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df).select(*on)
        )
        inv = inv.join(keep, on, "left_semi")
        # posting-list pair generation: one shuffle on (block, shingle), the
        # ≤max_df²/2 pairs per shingle are emitted in-partition — strictly
        # fewer exchanges than a self-join and bounded fan-out
        posting = (
            inv.groupBy(*on)
            .agg(F.array_sort(F.collect_list(F.struct(id_col, "n_sh"))).alias("ids"))
            .where(F.size("ids") >= 2)
        )
        pair_struct = F.flatten(F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: F.struct(
                    x[id_col].alias("a"), y[id_col].alias("b"),
                    x["n_sh"].alias("n_a"), y["n_sh"].alias("n_b")),
            ),
        ))
        common = (
            posting.select(F.explode(pair_struct).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                     F.col("p.n_a").alias("n_a"), F.col("p.n_b").alias("n_b"))
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        inv = t.select(
            F.col(id_col), *([F.col(block_col)] if block_col else []),
            F.explode("sh").alias("shingle"),
        )
        a = inv.alias("a")
        b = inv.alias("b")
        pair_counts = (
            a.join(b, on)
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .groupBy(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
            .agg(F.count(F.lit(1)).alias("common"))
        )
        sizes = t.select(id_col, "n_sh")
        sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
        common = pair_counts.join(sa, "a").join(sb, "b")
    result = (
        common
        .withColumn("jaccard", F.round(
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
        .localCheckpoint(eager=True)
    )
    global _WARNED_MAX_DF_DROP
    if max_df is not None and not _WARNED_MAX_DF_DROP:
        # exactness-loss probe: does ANY shingle exceed the cap? limit(1)
        # short-circuits (CollectLimit stops at the first hot shingle) and
        # the shingle table is still cache-hot here, so the probe is one
        # cheap partial-agg pass. The flag is set after the FIRST probe
        # regardless of outcome — clean corpora must not pay a full shingle
        # aggregation on every call; the trade-off is that a later lossy
        # corpus in the same process won't warn (documented here). (An
        # observe() on the df-count node would be free, but CollectMetrics
        # under the broadcast-semi-join exchange asserts in Spark 4.1 —
        # tried and reverted.)
        _WARNED_MAX_DF_DROP = True
        lossy = (
            t.select(*([F.col(block_col)] if block_col else []),
                     F.explode("sh").alias("shingle"))
            .groupBy(*on).agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_df).limit(1).count()
        )
        if lossy:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: max_df=%d dropped at least one hot "
                "shingle from the inverted index — jaccard is now a LOWER "
                "BOUND (pairs overlapping only on boilerplate shingles may "
                "be missed). Pass max_df=None for the exact quadratic mode. "
                "(warned once per process)", max_df)
    t.unpersist()
    return result


def near_dup_clusters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 32, bands: int = 8, shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """The complete near-dup dedup story (the SlimPajama/FineWeb run shape):
    MinHash-LSH verified pairs → connected components → one canonical
    representative per duplicate CLUSTER (pairwise keep-one under-deletes
    when A~B and B~C but A≁C — the component closes that).

    Returns ``(id_col, cluster, keep)`` for EVERY input doc: ``cluster`` is
    the smallest member id, ``keep`` = 1 iff this doc is the
    representative. Singletons keep themselves. Ids are zero-padded into
    the CC's lexicographic domain so the smallest member is the NUMERIC
    minimum; the star CC converges in O(log n) rounds on billion-node
    graphs (linking.py).
    """
    from pyspark.sql import types as T

    from .linking import connected_components_star

    id_dtype = docs.schema[id_col].dataType
    if not isinstance(id_dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"near_dup_clusters requires an integral '{id_col}' (cluster = "
            f"numeric-min member); got {id_dtype.simpleString()}")

    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, num_hashes, bands, shingle_n, jaccard_threshold)

    # 19 digits = max bigint width, so lpad can never truncate; negative ids
    # would break lexicographic-equals-numeric ordering AND the round-trip
    # cast — fail fast on the executor instead of mis-clustering silently
    def pad(c):
        return F.when(
            c < 0,
            F.raise_error(F.concat(
                F.lit("near_dup_clusters: negative id "), c.cast("string"))),
        ).otherwise(F.lpad(c.cast("string"), 19, "0"))

    comp = connected_components_star(
        pairs.select(pad(F.col("a")).alias("a"), pad(F.col("b")).alias("b")))
    mapped = comp.select(
        F.col("entity").cast("bigint").alias("_m_id"),
        F.col("component").cast("bigint").alias("_cluster"),
    )
    return (
        docs.select(id_col)
        .join(mapped, F.col(id_col) == F.col("_m_id"), "left")
        .select(
            id_col,
            F.coalesce("_cluster", F.col(id_col)).cast("bigint").alias("cluster"),
            (F.coalesce("_cluster", F.col(id_col)) == F.col(id_col))
            .cast("int").alias("keep"),
        )
    )

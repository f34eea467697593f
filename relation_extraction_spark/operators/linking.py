"""Entity linking + canonicalization (SURVEY.md §2 J4/R11, north_star stage 7-8).

Pipeline:
1. **MinHash-LSH blocking** over character n-gram shingles of entity names —
   pure Catalyst expressions (sequence/transform/aggregate over crc32), no
   UDF, no MLlib model state, fully deterministic. Candidate pairs are
   entities sharing an LSH band bucket.
2. **Verification**: n-gram Jaccard >= threshold OR containment (one name a
   substring of the other, the reference's fix_spo gate, utils/kg.py:308-309).
3. **Connected components** by iterative min-label propagation on the alias
   graph (GraphFrames-style, plain DataFrame joins, localCheckpoint per
   iteration to truncate lineage, convergence check) — Spark has no built-in
   CC; loop count is O(component diameter), tiny for alias clusters.
4. **Canonicalization**: every entity maps to the lexicographically smallest
   name in its component; edge endpoints are rewritten through the mapping
   (broadcast when small, shuffle join otherwise — Catalyst/AQE decide).

At 100 TB scale the shuffle keys are (band_id, band_hash) — uniformly hashed,
so no skew; the CC loop joins on entity which can skew on hub entities, which
AQE skew-join splitting handles.

Design follows the published blocking-then-resolve architecture of Spark
entity-resolution systems (SparkER, EDBT 2019; MinoanER, EDBT 2019 —
meta-blocking + massively parallel resolution) and the large-star/small-star
connected-components algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC 2014).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _shingles_expr(colname: str, n: int = 2):
    """Distinct character n-grams of a string column (pure Catalyst)."""
    c = F.col(colname)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def minhash_signature(shingles_col, num_hashes: int = 16):
    """sig[k] = min over shingles of crc32(k || shingle) — deterministic.

    Single aggregate pass with a running-min accumulator so the shingle
    array is materialized once per row, not once per hash (same fix as
    dedup.minhash_signatures; shingle arrays are never empty — the
    shingle expression emits ≥1 element for any non-empty name)."""
    max_crc = (1 << 32) - 1
    hashes = lambda s: F.array(*[  # noqa: E731
        F.crc32(F.concat(F.lit(f"{k}#"), s)) for k in range(num_hashes)])
    return F.aggregate(
        shingles_col, F.array_repeat(F.lit(max_crc).cast("bigint"), num_hashes),
        lambda acc, s: F.zip_with(acc, hashes(s), lambda a, b: F.least(a, b)))


def lsh_candidate_pairs(
    entities: DataFrame,
    name_col: str = "entity",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
    containment_block: bool = True,
    max_block: int = 1000,
    max_block_shingles: int = 8,
    signature_stop_max_df: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band bucket
    or (with ``containment_block``) a 2-gram shingle block.

    Default = 8 bands × 2 minhash rows: per-band collision probability is J²,
    so the candidate volume over dissimilar names drops quadratically
    (O(n²·J̄²), not O(n²·J̄)) while pairs at the verification threshold are
    still blocked with 1-(1-J²)^8 ≥ 0.995 recall at J = 0.7. Containment
    aliases with LOW shingle-Jaccard (a short canonical name inside a long
    decorated form, the utils/kg.py:308-309 repair pattern) no longer ride
    on single-hash luck: each name also blocks on its first
    ``max_block_shingles`` character 2-grams plus its final 2-gram, and a
    contained name shares EVERY one of its 2-grams with the containing
    name — so prefix-decorated, suffix-decorated AND both-ends-decorated
    forms (著名X先生) are all blocked deterministically, as long as the
    short name starts within the long name's first ``max_block_shingles``+1
    chars or ends at its end. Blocks larger than ``max_block`` names are
    purged before the self-join (block purging, SparkER meta-blocking) — a
    stop-shingle like a common surname pair never fans out; purged
    containment pairs with J ≥ threshold still arrive through the minhash
    bands.

    ``signature_stop_max_df``: drop shingles occurring in more than this
    many distinct names from the MINHASH SIGNATURE (names whose every
    shingle is that common keep their full set as a fallback). Short names
    have few shingles, so one corpus-wide decoration gram (著名-/-先生
    honorifics, ltd./inc. suffixes) wins the min with probability
    ~1/|shingles| and puts O((n/bands-collision)²) cross-family pairs into
    the candidate set — measured quadratic at 40k→400k entities
    (BENCH/PLANS.md round-4 soak). With the cap, signatures are driven by
    the discriminative shingles and candidate volume returns to ~linear;
    decorated true aliases still arrive via the containment block, which is
    independently df-purged by ``max_block``. Default None preserves the
    exact candidate set (and the cc_components oracle hash); large-corpus
    callers should set it (the soak uses 1000, like max_block). The purge
    is a broadcast anti-join on exploded shingles — the stop set never
    touches the driver and never becomes a literal expression (an earlier
    version inlined it as F.array(*lits), which exploded the Catalyst plan
    already at a few thousand hot shingles), so it stays bounded at any
    stop-set size: at most |names|·|avg shingles|/max_df shingles can
    exceed the cap, a few MB broadcast even at web scale."""
    rows_per_band = num_hashes // bands
    e = entities.select(name_col).dropDuplicates()
    shingles = _shingles_expr(name_col, shingle_n)
    if signature_stop_max_df is not None:
        exploded = e.select(F.col(name_col), F.explode(shingles).alias("_s"))
        hot = (
            exploded.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > signature_stop_max_df)
            .select("_s")
        )
        kept = (
            exploded.join(F.broadcast(hot), "_s", "left_anti")
            .groupBy(name_col).agg(F.collect_list("_s").alias("_kept"))
        )
        # names whose EVERY shingle is hot drop out of the anti-join
        # entirely (null _kept after the left join) and keep their full
        # shingle set as the fallback, exactly like the old expression path.
        # merge hint: kept has the SAME cardinality as e (one array row per
        # name) — size misestimation here made AQE try to broadcast 4M rows
        # into an 8g driver at the 4M-entity soak; an equal-sized
        # self-derived side must shuffle, never broadcast
        e = e.join(kept.hint("merge"), name_col, "left")
        shingles = F.when(F.size("_kept") > 0, F.col("_kept")) \
            .otherwise(_shingles_expr(name_col, shingle_n))
    sig = e.withColumn("_sh", shingles).withColumn(
        "sig", minhash_signature(F.col("_sh"), num_hashes)
    )
    banded = sig.select(
        F.col(name_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.hash(F.concat_ws(",", F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string")))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(name_col, "bb.band", "bb.bucket")
    if containment_block:
        # shingle keys live in the same (band, bucket) key space as the
        # minhash bands (band = -1), so ONE shuffle serves all blocks
        c = F.col(name_col)
        keys = F.array_distinct(F.concat(
            F.slice(_shingles_expr(name_col, 2), 1, max_block_shingles),
            F.array(c.substr(F.greatest(F.length(c) - 1, F.lit(1)), F.lit(2))),
        ))
        blocked = e.where(F.length(c) >= 2).select(
            F.col(name_col),
            F.explode(F.transform(
                keys,
                lambda s: F.struct(F.lit(-1).alias("band"),
                                   F.hash(s).alias("bucket")),
            )).alias("bb"),
        ).select(name_col, "bb.band", "bb.bucket")
        # anti-join against the OVERSIZED blocks, which are small by
        # construction (≤ n·keys/max_block survive the HAVING) — broadcast
        # keeps the purge map-side instead of shuffling the block table twice
        oversized = (
            blocked.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_block)
            .select("band", "bucket")
        )
        banded = banded.unionByName(
            blocked.join(F.broadcast(oversized), ["band", "bucket"], "left_anti"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{name_col}") < F.col(f"b.{name_col}"))
        .select(F.col(f"a.{name_col}").alias("a"), F.col(f"b.{name_col}").alias("b"))
        .dropDuplicates()
    )


def verified_alias_pairs(
    candidates: DataFrame,
    jaccard_threshold: float = 0.7,
    shingle_n: int = 2,
    containment: bool = True,
) -> DataFrame:
    """Keep pairs with n-gram Jaccard >= threshold, or substring containment
    under the reference's fix_spo gates (canonical side len > 1; alias side
    len > 4, contains CJK, no '·' — utils/kg.py:308-309, 321-322), which stop
    short names from chaining whole entity families together."""
    sh = lambda c: _shingles_expr(c, shingle_n)  # noqa: E731
    j = (
        F.size(F.array_intersect(sh("a"), sh("b")))
        / F.size(F.array_union(sh("a"), sh("b")))
    )
    cond = j >= jaccard_threshold
    if containment:
        alias_ok = lambda c: (  # noqa: E731
            (F.length(c) > 4) & (~F.col(c).contains("·"))
            & F.col(c).rlike("[\\u4e00-\\u9fa5]")
        )
        contain = (
            ((F.length("a") > 1) & F.col("b").contains(F.col("a")) & alias_ok("b"))
            | ((F.length("b") > 1) & F.col("a").contains(F.col("b")) & alias_ok("a"))
        )
        cond = cond | contain
    return candidates.where(cond)


def connected_components(
    pairs: DataFrame, max_iter: int = 20, stats: dict | None = None
) -> DataFrame:
    """Min-label propagation over undirected pairs(a, b) → (entity, component).

    Deterministic: component id = lexicographically smallest member name.
    Each iteration is one shuffle; lineage truncated via localCheckpoint.
    ``stats`` (optional dict) receives {"rounds": <iterations run>} —
    convergence evidence for scale soaks.
    """
    spark = pairs.sparkSession
    sym = pairs.select("a", "b").union(pairs.select(F.col("b"), F.col("a"))).dropDuplicates()
    labels = (
        sym.select(F.col("a").alias("entity"))
        .dropDuplicates()
        .withColumn("component", F.col("entity"))
    )
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["entity"], "inner")
            .groupBy(F.col("a").alias("entity"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "entity", "left")
            .select(
                "entity",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias("component"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if stats is not None:
            stats["rounds"] = it + 1
        if changed == 0:
            break
    return labels


def canonical_mapping(
    entities: DataFrame,
    name_col: str = "entity",
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    algorithm: str = "star",
    signature_stop_max_df: int | None = None,
) -> DataFrame:
    """entity → canonical name (component representative); singleton entities
    map to themselves. ``algorithm``: 'star' (large-star/small-star, O(log n)
    rounds — the scale default) or 'label' (min-label propagation,
    O(diameter) rounds, fewer shuffles per round for shallow alias clusters).
    ``signature_stop_max_df`` forwards the minhash stop-shingle cap (see
    lsh_candidate_pairs) — set it on corpora with corpus-wide decoration
    grams."""
    cands = lsh_candidate_pairs(entities, name_col, num_hashes, bands,
                                signature_stop_max_df=signature_stop_max_df)
    aliases = verified_alias_pairs(cands, jaccard_threshold)
    cc = connected_components_star if algorithm == "star" else connected_components
    comp = cc(aliases)
    all_e = entities.select(F.col(name_col).alias("entity")).dropDuplicates()
    return (
        all_e.join(comp, "entity", "left")
        .select("entity", F.coalesce("component", F.col("entity")).alias("canonical"))
    )


def canonicalize_edges(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite edge endpoints through the canonical mapping (stage 8→9)."""
    m_s = mapping.select(F.col("entity").alias("subject"), F.col("canonical").alias("_cs"))
    m_o = mapping.select(F.col("entity").alias("object"), F.col("canonical").alias("_co"))
    return (
        edges.join(m_s, "subject", "left")
        .join(m_o, "object", "left")
        .select(
            F.coalesce("_cs", F.col("subject")).alias("subject"),
            "predicate",
            F.coalesce("_co", F.col("object")).alias("object"),
        )
        .dropDuplicates()
    )


def connected_components_star(
    pairs: DataFrame, max_iter: int = 25, stats: dict | None = None
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al., "Connected
    Components in MapReduce and Beyond") on undirected pairs(a, b) →
    (entity, component). Converges in O(log n) rounds on adversarial chains
    where plain min-label propagation needs O(diameter) — the scale path for
    canonicalizing billion-node alias graphs.

    Node ordering is lexicographic on the entity name (deterministic,
    partition-invariant); component id = smallest member. ``stats``
    (optional dict) receives {"rounds": <rounds run>}.
    """
    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric neighborhoods; attach every strictly-larger neighbor of u
        # to min(Γ(u) ∪ {u})
        sym = e.union(e.select(F.col("v"), F.col("u")))
        m = (
            sym.union(sym.select("u", F.col("u")))
            .groupBy("u").agg(F.min("v").alias("m"))
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            # no dropDuplicates here: small_star's nbr dedup absorbs the
            # multiplicity one shuffle later (min-aggregations are
            # duplicate-insensitive) — one fewer exchange per round
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient (larger → smaller); attach all small neighbors and u itself
        # to min(N(u) ∪ {u})
        oriented = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        nbr = oriented.union(oriented.select("u", F.col("u"))).dropDuplicates()
        m = nbr.groupBy("u").agg(F.min("v").alias("m"))
        return (
            nbr.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .dropDuplicates()
        )

    prev = None
    for it in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        sig = edges.agg(F.count(F.lit(1)).alias("c"),
                        F.sum(F.hash("u", "v")).alias("s")).collect()[0]
        cur = (sig["c"], sig["s"])
        if stats is not None:
            stats["rounds"] = it + 1
        if cur == prev:
            break
        prev = cur

    all_nodes = pairs.select(F.col("a").alias("entity")).union(
        pairs.select("b")).dropDuplicates()
    return (
        all_nodes.join(edges.withColumnRenamed("u", "entity"), "entity", "left")
        .groupBy("entity")
        .agg(F.min(F.coalesce("v", F.col("entity"))).alias("component"))
    )

"""Web-corpus curation operators beyond the basic text-analysis family:
repetition scoring (Gopher-style), PII detection/redaction, global
paragraph-level deduplication, and benchmark decontamination.

Provenance is published literature, not the reference repo (which has no
curation stage): the repetition signals follow Rae et al. 2021 (Gopher,
§A1.1 quality rules — duplicate-word and top-n-gram fractions), paragraph
dedup follows Wenzek et al. 2020 (CCNet's shared-paragraph removal), and
decontamination follows Brown et al. 2020 (GPT-3 appendix C's 13-gram
overlap rule). All hot paths are pure Catalyst column expressions or
uniform-key shuffles — no Python UDFs, no driver collects — and every
operator is mirrorable in ANSI SQL for the driver oracle.

Scale notes (100 TB):
* ``repetition_scores`` is per-document array math inside whole-stage
  codegen — zero shuffles; cost is O(distinct-grams × grams) per doc,
  bounded by document length, never by corpus size.
* ``pii_stats``/``pii_redact`` are regexp projections — zero shuffles.
* ``paragraph_dedup`` picks first-seen winners with a map-side-combinable
  min — never a window over the paragraph hash, whose hottest partition
  would hold every copy of the most-duplicated boilerplate line in one
  unsplittable task; remaining shuffles key on doc id (uniform).
* ``decontaminate`` broadcasts the benchmark n-gram set (benchmarks are
  small by construction — a few MB for every eval suite in existence) so
  the corpus-side scan stays shuffle-free until the final per-doc count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared by Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PHONE_RE = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{4}\\b"


def _words(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), "\\s+")


def _gram_array(words, n: int):
    """Positional n-grams (no short-text fallback) — delegates to the one
    shared zip_with kernel in dedup.positional_word_grams."""
    from .dedup import positional_word_grams

    return positional_word_grams(words, n)


def _word_grams(words, n: int):
    """All n-gram strings of a word array; if the text has fewer than n
    words the whole text is a single gram (GPT-3 appendix C edge rule).

    Zero-length grams are dropped: ``_words`` on empty/whitespace-only text
    yields [""], whose short-text fallback would emit an empty-string gram —
    one blank benchmark row would then flag EVERY blank document as
    contaminated (and two blank documents would "share" a gram). Blank text
    carries no content to match, so it contributes no grams at all."""
    grams = F.when(
        F.size(words) >= n, _gram_array(words, n)
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return F.filter(grams, lambda g: g != "")


def repetition_columns(text_col: str = "text", gram_n: int = 2) -> dict:
    """The repetition signals as named Columns (see
    text_analysis.quality_columns for why composed pipelines want this)."""
    words = _words(text_col)
    n_words = F.size(words)
    dup_word_frac = F.when(
        n_words > 0, 1.0 - F.size(F.array_distinct(words)) / n_words
    ).otherwise(F.lit(0.0))
    # zip_with gram build (O(n·L)): the transform+slice form measured ~7×
    # slower at sf0.1 (same finding as dedup.word_shingles)
    grams = F.when(
        n_words >= gram_n, _gram_array(words, gram_n)
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    # top count = longest equal-run in the SORTED gram array, one aggregate
    # pass. The naive transform(distinct, g -> size(filter(grams, = g)))
    # form re-evaluates the grams subtree per outer element (Spark does no
    # CSE across lambda boundaries) — measured 60ms/doc vs <1ms for this.
    top_count = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_gram_frac = F.when(n_grams > 0, top_count / n_grams).otherwise(F.lit(0.0))
    return {
        "n_words": n_words.cast("bigint"),
        "dup_word_frac": F.round(dup_word_frac, 4),
        "top_gram_frac": F.round(top_gram_frac, 4),
    }


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    gram_n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    duplicate-word fraction (1 − distinct/total) and the fraction of word
    n-grams claimed by the single most frequent n-gram. High values mark
    boilerplate and degenerate machine-generated text for filtering.

    Pure per-document array expressions — the 100-TB cost model is a map
    stage with zero shuffles.
    """
    cols = repetition_columns(text_col, gram_n)
    return docs.select(id_col, *[c.alias(n) for n, c in cols.items()])


def pii_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Count PII occurrences (emails, IPv4 literals, intl-format phone
    numbers) per document. Regexes are restricted to the Java∩RE2 common
    subset so the DuckDB oracle runs the identical patterns."""
    t = F.col(text_col)
    return docs.select(
        id_col,
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
    )


def pii_redact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Replace PII spans with typed placeholder tokens. Email first (its
    local part can contain digit runs an IP/phone pattern would then chew
    on), then IPs, then phones — the order is part of the contract and the
    oracle mirrors it."""
    t = F.col(text_col)
    clean = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    return docs.select(id_col, clean.alias("clean_text"))


def paragraph_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sep: str = "\n", materialize: bool = True,
) -> DataFrame:
    """Global paragraph-level dedup (CCNet, Wenzek et al. 2020): every
    paragraph keeps exactly its FIRST occurrence corpus-wide (ordered by
    ``(id_col, position)``), later copies are dropped, and each document is
    reassembled from its surviving paragraphs in original order.

    The first-seen winner per paragraph is computed with a map-side-
    combinable ``min(struct(id, pos))`` groupBy — NOT a row_number
    window: a window partitions ALL occurrences of the hottest boilerplate
    paragraph ("subscribe to our newsletter" × 10⁹ at web scale) into one
    unsplittable task, while a combinable min reduces each of them inside
    its map task, shuffling one 12-byte candidate per task per key (the
    paragraph TEXT never rides the winner shuffle — round 8; the winner
    coordinates re-attach to their own rows on the reused key exchange).
    The final per-doc aggregation computes text_kept, n_kept AND the
    totals in ONE pass, so the upstream text expression is evaluated
    once and there is no totals join. Returns
    ``(id_col, text_kept, n_kept, n_dropped)``; documents whose text splits
    into zero non-blank paragraphs are absent from the output (nothing to
    keep or drop).

    ``materialize`` (default on): localCheckpoint the exploded paragraph
    table before its two consumers (winner aggregation + re-attach join).
    When the planner broadcasts the winners (small-corpus estimates), the
    join's probe side would otherwise re-evaluate the whole upstream text
    derivation; when it picks a sort-merge join, both consumers shuffle
    the identical subtree by ``_k`` and exchange reuse makes the
    checkpoint redundant — measured equal at sf1.0, so the default favors
    safety for expensive upstreams (e.g. curate_docs' dedup chain). The
    hottest boilerplate key lands in a skew-splittable JOIN partition,
    never an unsplittable window task.
    """
    # \Q..\E: split treats its pattern as a Java regex but reassembly joins
    # with the literal sep — quote it so both sides agree for any separator
    split_pars = F.filter(
        F.split(F.col(text_col), "\\Q" + sep + "\\E"), lambda p: F.trim(p) != ""
    )
    # key: xxhash64 of the normalized paragraph — 8 bytes through the
    # shuffles, same grouping (the key never surfaces in the output)
    pars = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(split_pars).alias("pos", "par"),
    ).withColumn("_k", F.xxhash64(F.lower(F.trim(F.col("par")))))
    if materialize:
        pars = pars.localCheckpoint(eager=False)
    # (_id, pos) is unique, so min(struct) == the first-seen occurrence
    winners = pars.groupBy("_k").agg(F.min(F.struct("_id", "pos")).alias("w"))
    flagged = pars.join(winners, "_k").withColumn(
        "_is_w",
        (F.col("_id") == F.col("w._id")) & (F.col("pos") == F.col("w.pos")))
    return (
        flagged.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("_is_w"), F.struct("pos", "par")))),
                    lambda s: s["par"],
                ),
                sep,
            ).alias("text_kept"),
            F.sum(F.col("_is_w").cast("long")).alias("_nk"),
            F.count(F.lit(1)).alias("_nt"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
            F.col("_nk").cast("bigint").alias("n_kept"),
            (F.col("_nt") - F.col("_nk")).cast("bigint").alias("n_dropped"),
        )
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    bench_text_col: str = "text", n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C): flag every training
    document sharing at least one word n-gram (default 13) with any
    benchmark text; ``n_hits`` counts the document's DISTINCT overlapping
    n-grams. Benchmarks shorter than n words contribute their whole text
    as a single gram.

    The benchmark n-gram set is broadcast (eval suites are tiny next to a
    training corpus), so the corpus side is one shuffle-free scan + explode
    followed by a per-doc count on uniform keys.
    """
    doc_grams = docs.select(
        id_col,
        F.explode(F.array_distinct(_word_grams(_words(text_col), n))).alias("g"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(_word_grams(_words(bench_text_col), n))).alias("g")
        ).distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def curate_docs(
    docs: DataFrame, benchmark: DataFrame | None = None,
    id_col: str = "doc_id", text_col: str = "text",
    min_quality: float = 0.5, max_dup_word_frac: float = 0.6,
    max_top_gram_frac: float = 0.5, decontaminate_n: int = 13,
    paragraph_sep: str = "\n", materialize: bool = True,
    gopher: bool = False, gopher_min_words: int = 50,
    gopher_max_words: int = 100_000,
) -> DataFrame:
    """The standard pretraining-curation chain, all Catalyst-side:
    exact dedup → global paragraph dedup → FUSED quality + repetition gates
    (one projection, zero joins) → (optional) benchmark decontamination →
    PII redaction. Returns the curated corpus ``(id_col, text_col)``; every
    stage is a uniform-key shuffle or a shuffle-free projection.

    ``materialize``: localCheckpoint the paragraph-dedup output (and, when
    decontaminating, the gated survivor set) — downstream consumers would
    otherwise each re-evaluate the dedup shuffles and the regex gates
    (57.6 s → 39.5 s at 500k docs on local[32]). Inside KGPipeline the
    catalog checkpoint plays this role for the stage as a whole; the
    internal boundaries still pay off because the chain has multiple
    internal consumers. The default gates are English-centric (stopword
    ratio) — pass permissive thresholds for non-whitespace scripts.

    ``gopher=True`` additionally requires the full Gopher A1.1 rule set
    (``gopher_flags``'s ``gopher_pass`` — applied AFTER paragraph dedup,
    like the original pipeline ordering) with its own word-count bounds;
    OFF by default to keep the historical chain semantics."""
    from .dedup import exact_dedup
    from .text_analysis import quality_columns

    d = docs.join(exact_dedup(docs, id_col=id_col, text_col=text_col)
                  .select(id_col), id_col, "left_semi")
    pd_ = paragraph_dedup(d, id_col=id_col, text_col=text_col, sep=paragraph_sep)
    d = (pd_.where(F.col("n_kept") > 0)
         .select(id_col, F.col("text_kept").alias(text_col)))
    if materialize:
        d = d.localCheckpoint(eager=True)
    qc = quality_columns(text_col)
    rc = repetition_columns(text_col)
    d = (
        d.where(
            (qc["quality"] >= min_quality)
            & (rc["dup_word_frac"] <= max_dup_word_frac)
            & (rc["top_gram_frac"] <= max_top_gram_frac)
        )
        .select(id_col, text_col)
    )
    if gopher:
        # materialize BEFORE deriving the gopher semi-join: gopher_flags(d)
        # and the join's left side both consume d, which would re-evaluate
        # the regex gate chain twice (round-7 ADVICE — the round-6 'no
        # subtree consumed twice' lesson)
        if materialize:
            d = d.localCheckpoint(eager=True)
        passing = gopher_flags(
            d, id_col=id_col, text_col=text_col,
            min_words=gopher_min_words, max_words=gopher_max_words,
        ).where(F.col("gopher_pass") == 1).select(id_col)
        d = d.join(passing, id_col, "left_semi")
    if materialize and benchmark is not None:
        d = d.localCheckpoint(eager=True)
    if benchmark is not None:
        clean = decontaminate(d, benchmark, id_col=id_col, text_col=text_col,
                              n=decontaminate_n).where(F.col("contaminated") == 0)
        d = d.join(clean.select(id_col), id_col, "left_semi")
    return pii_redact(d, id_col=id_col, text_col=text_col) \
        .withColumnRenamed("clean_text", text_col)


def decontaminate_excise(
    docs: DataFrame, benchmark: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    bench_text_col: str = "text", n: int = 13,
) -> DataFrame:
    """Contamination REMOVAL (GPT-3 appendix C's stronger form): excise
    every word position covered by a benchmark-overlapping n-gram and keep
    the rest of the document, instead of dropping the whole document.
    Returns ``(id_col, clean_text, n_removed_words)`` for EVERY input doc;
    ``clean_text`` is whitespace-normalized lowercase (the gram-matching
    domain) on both the operator and its oracle.

    Scale shape: the per-word explode — one row per word — runs ONLY for
    documents with at least one hit (a broadcast-semi-joined minority);
    clean documents pass through as a projection. All shuffles key on the
    doc id or (doc id, word index) — uniform.
    """
    words = _words(text_col)
    norm = F.concat_ws(" ", words)
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(_word_grams(_words(bench_text_col), n))).alias("g")
        ).distinct()
    )
    # positional grams (0-based start index), only real n-grams: a doc
    # shorter than n words cannot cover a full benchmark gram for excision
    grams_pos = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.when(F.size(words) >= n, _gram_array(words, n))
            .otherwise(F.array().cast("array<string>"))
        ).alias("p0", "g"),
    )
    hits = grams_pos.join(F.broadcast(bench_grams), "g").select("_id", "p0")
    covered = hits.select(
        "_id", F.explode(F.sequence(F.col("p0"), F.col("p0") + (n - 1))).alias("idx")
    ).dropDuplicates()
    dirty_ids = covered.select("_id").dropDuplicates()
    dirty = docs.join(dirty_ids, docs[id_col] == dirty_ids["_id"], "left_semi")
    words_pos = dirty.select(
        F.col(id_col).alias("_id"), F.posexplode(words).alias("idx", "w"))
    cleaned = (
        words_pos.join(covered, ["_id", "idx"], "left_anti")
        .groupBy("_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("idx", "w"))),
                            lambda s: s["w"]),
                " ",
            ).alias("clean_text"),
        )
    )
    removed = covered.groupBy("_id").agg(F.count(F.lit(1)).alias("n_removed_words"))
    dirty_out = (
        dirty.select(F.col(id_col).alias("_id"))
        .join(cleaned, "_id", "left")       # fully-covered doc → no words left
        .join(removed, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_removed_words", F.lit(0)).cast("bigint")
            .alias("n_removed_words"),
        )
    )
    clean_out = (
        docs.join(dirty_ids, docs[id_col] == dirty_ids["_id"], "left_anti")
        .select(id_col, norm.alias("clean_text"),
                F.lit(0).cast("bigint").alias("n_removed_words"))
    )
    return clean_out.unionByName(dirty_out)


def boilerplate_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sep: str = "\n", max_df: int = 2, materialize: bool = True,
) -> DataFrame:
    """Boilerplate removal (the OTHER CCNet paragraph rule): drop every
    paragraph occurring in MORE than ``max_df`` distinct documents from
    ALL of them — headers/footers/cookie banners repeat across a site, so
    no occurrence is worth keeping (first-seen dedup instead keeps one
    copy; use that for content-like duplication). Returns
    ``(id_col, text_kept, n_kept, n_dropped)`` for every doc with ≥1
    paragraph.

    Scale shape: the paragraph df-count is a map-side-combinable
    countDistinct-free aggregation on md5(paragraph) (count of distinct
    docs per paragraph — computed as count over pre-deduped (hash, doc)
    rows, both uniform keys); the hottest boilerplate key reduces inside
    map tasks. No windows, no text amplification.
    """
    split_pars = F.filter(
        F.split(F.col(text_col), "\\Q" + sep + "\\E"), lambda p: F.trim(p) != ""
    )
    pars = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(split_pars).alias("pos", "par"),
    ).withColumn("_k", F.xxhash64(F.lower(F.trim(F.col("par")))))
    if materialize:
        # pars feeds both the df-count aggregation and the join back —
        # checkpoint once instead of re-running the upstream split/explode
        # (paragraph_dedup's round-8 lesson; pass False at corpus scale to
        # trade the write for a second scan)
        pars = pars.localCheckpoint(eager=False)
    # document frequency per paragraph: dedupe (key, doc) then count — both
    # steps partial-aggregate map-side on uniform hash keys
    df_counts = (
        pars.select("_k", "_id").dropDuplicates()
        .groupBy("_k").agg(F.count(F.lit(1)).alias("_df"))
    )
    flagged = pars.join(df_counts, "_k")
    kept = F.col("_df") <= max_df
    return (
        flagged.groupBy("_id")
        .agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.when(kept, F.struct("pos", "par")))),
                        lambda s: s["par"],
                    ),
                    sep,
                ),
                F.lit(""),
            ).alias("text_kept"),
            F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
            F.sum((~kept).cast("int")).cast("bigint").alias("n_dropped"),
        )
        .withColumnRenamed("_id", id_col)
    )


# Gopher rule A1 "required words" set (Rae et al. 2021, App. A1.1): a doc
# must contain at least 2 DISTINCT of these to count as running English
# prose rather than tag soup / navigation chrome.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
#: characters Gopher counts as "symbols" for the symbol-to-word ratio
GOPHER_SYMBOLS = ("#", "…")
#: line prefixes counted as bullets
GOPHER_BULLETS = ("•", "-", "*")


def gopher_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 50, max_words: int = 100_000,
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021, App.
    A1.1) as ONE pure-Catalyst projection — the standard pre-training
    corpus gate, complementing ``repetition_scores`` (A1.1's repetition
    half) and ``text_analysis.quality_score`` (generic features):

    * word count within [min_words, max_words];
    * mean word length within [3, 10] chars;
    * symbol-to-word ratio (# and …) < 0.1;
    * < 90% of lines starting with a bullet, < 30% ending with an
      ellipsis;
    * ≥ 80% of words containing at least one alphabetic character;
    * ≥ 2 distinct required English stopwords present.

    Ratios are integer micro-units (`x·10⁶ DIV y` — repo oracle rule: no
    float divergence at any SF); ``gopher_pass`` is the conjunction. Zero
    shuffle — the plan must stay a scan+project (guarded in
    test_plan_shapes alongside the other curation projections)."""
    t = F.col(text_col)
    words = F.filter(F.split(t, "\\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    safe_words = F.greatest(n_words, F.lit(1))
    total_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
    n_symbols = sum(
        (F.length(t) - F.length(F.replace(t, F.lit(c), F.lit(""))))
        for c in GOPHER_SYMBOLS
    )
    lines = F.filter(F.split(t, "\\n"), lambda l: F.length(F.trim(l)) > 0)
    safe_lines = F.greatest(F.size(lines), F.lit(1))
    is_bullet = lambda l: (  # noqa: E731
        F.trim(l).startswith(GOPHER_BULLETS[0])
        | F.trim(l).startswith(GOPHER_BULLETS[1])
        | F.trim(l).startswith(GOPHER_BULLETS[2]))
    n_bullet = F.size(F.filter(lines, is_bullet))
    is_ellipsis = lambda l: (  # noqa: E731
        F.trim(l).endswith("…") | F.trim(l).endswith("..."))
    n_ellipsis = F.size(F.filter(lines, is_ellipsis))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
    out = docs.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        (total_chars * F.lit(1_000_000)).cast("bigint").alias("_tc"),
        safe_words.cast("bigint").alias("_sw"),
        (n_symbols.cast("bigint") * F.lit(1_000_000)).alias("_sy"),
        (n_bullet.cast("bigint") * F.lit(1_000_000)).alias("_bu"),
        (n_ellipsis.cast("bigint") * F.lit(1_000_000)).alias("_el"),
        (n_alpha.cast("bigint") * F.lit(1_000_000)).alias("_al"),
        safe_lines.cast("bigint").alias("_sl"),
        n_stop.cast("bigint").alias("n_stop_distinct"),
    ).selectExpr(
        id_col, "n_words",
        "_tc DIV _sw AS mean_wlen_micro",
        "_sy DIV _sw AS symbol_ratio_micro",
        "_bu DIV _sl AS bullet_ratio_micro",
        "_el DIV _sl AS ellipsis_ratio_micro",
        "_al DIV _sw AS alpha_ratio_micro",
        "n_stop_distinct",
    )
    passing = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_wlen_micro") >= 3_000_000)
        & (F.col("mean_wlen_micro") <= 10_000_000)
        & (F.col("symbol_ratio_micro") < 100_000)
        & (F.col("bullet_ratio_micro") < 900_000)
        & (F.col("ellipsis_ratio_micro") < 300_000)
        & (F.col("alpha_ratio_micro") >= 800_000)
        & (F.col("n_stop_distinct") >= 2)
    )
    return out.withColumn("gopher_pass", passing.cast("bigint"))

"""Text-analysis operators for training-data curation: language ID, quality
scoring, token counting, document fingerprinting. All pure Catalyst column
expressions (whole-stage codegen; no Python on the hot path), each mirrorable
in ANSI SQL for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def token_count_columns(text_col: str = "text") -> dict:
    """The token-count features as named Columns (see quality_columns)."""
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    # length(text) − count(\s) ≡ length(regexp_replace(text, '\s+', '')):
    # same integer, but a match COUNT instead of building the stripped
    # string (one regex pass either way, zero allocation this way)
    wordchars = (F.length(F.col(text_col))
                 - F.regexp_count(F.col(text_col), F.lit("\\s")))
    return {
        "n_tokens": F.size(words),
        "n_bpe_est": F.ceil(wordchars / 4).cast("bigint"),
        "n_chars": F.length(text_col),
    }


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (word chars / 4, ceil)."""
    cols = token_count_columns(text_col)
    return docs.select(id_col, *[c.alias(n) for n, c in cols.items()])


def quality_columns(text_col: str = "text") -> dict:
    """The quality features as named Columns, so composed pipelines (e.g.
    KGEngine.curate) can fuse them into one projection with other per-doc
    signals instead of paying a scan + join per operator."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.lower(F.trim(t)), "\\s+")
    n_words = F.size(words)
    # single-char-class match counts instead of length(regexp_replace(...)):
    # identical integers (each match is one removed char), no string build
    punct = F.regexp_count(t, F.lit("[^\\w\\s]"))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*_EN_STOPWORDS)))
    mean_wlen = F.when(n_words > 0,
                       (n_chars - F.regexp_count(t, F.lit("\\s"))) / n_words
                       ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    score = (
        F.when(n_words >= 5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wlen >= 2) & (mean_wlen <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return {
        "punct_ratio": F.round(punct_ratio, 4),
        "stop_ratio": F.round(stop_ratio, 4),
        "mean_word_len": F.round(mean_wlen, 4),
        "quality": F.round(score, 2),
    }


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length. Score = simple bounded combination."""
    cols = quality_columns(text_col)
    return docs.select(id_col, *[c.alias(n) for n, c in cols.items()])


def lang_id_columns(text_col: str = "text") -> dict:
    """The language-ID prediction as a named Column (see quality_columns)."""
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    cjk = F.regexp_count(t, F.lit("[\\u4e00-\\u9fa5]"))
    words = F.split(F.lower(F.trim(t)), "\\s+")
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*_EN_STOPWORDS)))
    stop_ratio = F.when(F.size(words) > 0, stop_hits / F.size(words)).otherwise(F.lit(0.0))
    return {
        "lang_pred": F.when(cjk / n_chars > 0.25, "zh")
        .when(stop_ratio >= 0.05, "en")
        .otherwise("unknown"),
    }


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK-char share → zh; else stopword share → en;
    else unknown. (The KG pipeline consumes only rows detected zh/declared zh.)"""
    cols = lang_id_columns(text_col)
    return docs.select(id_col, *[c.alias(n) for n, c in cols.items()])


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprint: md5 of normalized text (exact) +
    md5 of the sorted distinct token set (order-insensitive)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    tokset = F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(norm, " "))))
    return docs.select(
        id_col,
        F.md5(norm).alias("fp_exact"),
        F.md5(tokset).alias("fp_tokenset"),
    )


def char_frequency(docs: DataFrame, text_col: str = "text", min_count: int = 50) -> DataFrame:
    """A11: symbol frequency profile (reference data/lic_2020.py:857-867)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("ch").count()
        .where(F.col("count") > min_count)
        .orderBy(F.desc("count"), F.asc("ch"))
    )


ROLL_P = 1_000_000_007  # modulus < 2^30: products stay inside bigint
ROLL_B = 131


def rolling_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (winnowing-style): hash
    every ``window``-token window with h = Σ c_j · B^(w-1-j) mod P where
    c_j = (md5-derived 60-bit token code) mod P, then keep the min/max window
    hash and window count. Pure Catalyst, exactly mirrorable in SQL."""
    words = F.split(F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " ")), " ")
    codes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint") % ROLL_P)
    n = F.size(words)
    n_win = F.greatest(n - (window - 1), F.lit(1))
    # chained zip_with over shifted copies instead of slice-per-window inside
    # a transform lambda: the lambda form re-evaluated `codes` — the whole
    # md5 transform — once per WINDOW POSITION (no CSE across lambda
    # boundaries, the round-8 simhash/paragraph lesson), i.e. O(n·window)
    # md5 passes. The chain references codes `window` times at ROW level.
    # h after k steps: h[i] = fold of codes[i..i+k] — zip_with pads the
    # shorter side with NULL, which propagates and is sliced off below,
    # exactly like dedup.positional_word_grams.
    chain = codes
    for k in range(1, window):
        chain = F.zip_with(
            chain,
            F.slice(codes, k + 1, F.greatest(n - k, F.lit(1))),
            lambda acc, c: (acc * ROLL_B + c) % ROLL_P,
        )
    # short texts (< window words): one window over ALL codes — the same
    # value the old slice(codes, 1, window) fold produced
    whole = F.aggregate(
        codes, F.lit(0).cast("bigint"),
        lambda acc, c: (acc * ROLL_B + c) % ROLL_P)
    whash = F.when(n >= window, F.slice(chain, 1, n_win)) \
        .otherwise(F.array(whole))
    return docs.select(
        id_col,
        F.array_min(whash).alias("roll_min"),
        F.array_max(whash).alias("roll_max"),
        n_win.cast("bigint").alias("n_windows"),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document into whitespace-token
    chunks of at most ``max_tokens``, consecutive chunks sharing
    ``overlap`` tokens — the shape every pretraining/RAG pipeline needs
    between curation and tokenization (the reference consumes pre-chunked
    ≤203-token texts, data/lic_2020.py; this is the stage that PRODUCES
    such inputs from raw pages).

    Chunk starts advance by the stride ``max_tokens − overlap``; the last
    chunk may be shorter, empty/whitespace-only docs yield no rows, and a
    final window that would START inside the previous chunk's tail (pure
    overlap, no new tokens) is not emitted. Output: (id, chunk_id,
    n_chunks, chunk_text, n_tokens).

    Pure Catalyst — split → sequence → posexplode → slice → array_join —
    so chunking is map-only (zero shuffles, whole-stage codegen) and
    fan-out is rows-per-doc = ceil((n−overlap)/stride), each row bounded
    by max_tokens: no document, however long, materializes more than one
    chunk per output row."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap ({overlap}) < max_tokens "
                         f"({max_tokens})")
    stride = max_tokens - overlap
    # strip ALL edge whitespace (trim handles only ASCII spaces): a leading
    # tab/newline would otherwise leave a phantom '' first token that the
    # empty-doc filter mistakes for a blank document (round-6 review) —
    # reachable via extract_text output, which can end in \t
    words = F.split(
        F.regexp_replace(F.col(text_col), "^\\s+|\\s+$", ""), "\\s+")
    n = F.size(words)
    # greatest(1, ·): a non-empty doc with ≤ overlap tokens is one chunk
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    return (
        docs.select(
            F.col(id_col), words.alias("_w"), n.alias("_n"),
            n_chunks.alias("n_chunks"))
        .where((F.col("_n") > 0) & (F.element_at("_w", 1) != ""))
        .select(
            id_col, "_w", "n_chunks",
            F.explode(F.sequence(
                F.lit(0), F.col("n_chunks") - 1)).alias("_i"))
        .select(
            id_col,
            F.col("_i").cast("bigint").alias("chunk_id"),
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.array_join(
                F.slice(F.col("_w"), F.col("_i") * stride + 1, max_tokens),
                " ").alias("chunk_text"),
            F.least(
                F.size("_w") - F.col("_i") * stride, F.lit(max_tokens))
            .cast("bigint").alias("n_tokens"))
    )


def top_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, min_df: int = 1, max_df_ratio: float = 0.5,
) -> DataFrame:
    """Per-document distinctive terms — tf·idf-shaped keyword extraction
    for corpus exploration / topic surfacing in a training-data pipeline:
    ``score_micro = tf · (N/df) · 10⁶`` as EXACT integers (DECIMAL(38,0)
    intermediates — the repo's lift_micro pattern; a log-idf would need
    floats, which break the bit-exact oracle contract, so this is the
    documented linear-idf variant: per-term orderings are identical, the
    cross-term top-k weights rare terms more than log would).

    Terms are the lowercased whitespace words; ``min_df`` drops hapax
    noise and ``max_df_ratio`` drops corpus-wide stopwords before the
    per-doc window. Shuffle shape: one (doc, term) tf groupBy, one term
    df groupBy (both map-side combinable), a term-keyed join (uniform —
    head terms are gone by max_df), then the per-doc top-k window whose
    partition is the doc's distinct-term count. N is one driver scalar,
    like pagerank's graph order."""
    from pyspark.sql import Window

    n_docs = docs.select(id_col).distinct().count()
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"),
        lambda w: F.length(w) > 0)
    terms = docs.select(F.col(id_col).alias("_id"),
                        F.explode(words).alias("term"))
    tf = terms.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = (
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_df)
               & (F.col("df") <= int(n_docs * max_df_ratio)))
    )
    scored = tf.join(df_t, "term").select(
        "_id", "term", "tf", "df",
        F.expr(f"CAST((CAST(tf AS DECIMAL(38,0)) * {n_docs} * 1000000)"
               " DIV CAST(df AS DECIMAL(38,0)) AS BIGINT)")
        .alias("score_micro"))
    w = Window.partitionBy("_id").orderBy(
        F.col("score_micro").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(F.col("_id").alias(id_col), "term",
                F.col("tf").cast("bigint").alias("tf"),
                F.col("df").cast("bigint").alias("df"),
                "score_micro",
                F.col("term_rank").cast("bigint").alias("term_rank"))
    )

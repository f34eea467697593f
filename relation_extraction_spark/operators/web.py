"""Web-corpus URL operators: canonical URL + registrable-host extraction.

A Common-Crawl-scale pipeline keys dedup, lineage ranges and per-domain
rollups on a CANONICAL url — raw WARC urls differ in case, default ports,
fragments and query-param order. Pure Catalyst expressions (no UDF):

* scheme + host lowercased, ``www.`` prefix dropped;
* default port stripped (``:80`` for http, ``:443`` for https);
* fragment dropped;
* query parameters sorted (param order is almost never semantic);
* trailing ``/`` on a bare path dropped.

These rules are the overlap of the standard URL-normalization sets (RFC 3986
syntax-based normalization plus the usual safe semantic rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def url_host(url: Column) -> Column:
    """Lowercased host without a ``www.`` prefix (registrable host)."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, "^www\\.", "")


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = url_host(url)
    # parse_url returns host WITHOUT the port; extract it separately —
    # skipping optional userinfo ('user:pass@') and bracketed IPv6 literals
    port = F.regexp_extract(
        url,
        "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(?:\\[[^\\]]+\\]|[^/:?#]+):(\\d+)",
        1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", "").otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    sorted_query = F.when(
        query.isNotNull() & (query != ""),
        F.concat(F.lit("?"), F.concat_ws("&", F.sort_array(F.split(query, "&")))),
    ).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path, sorted_query,
    )


def with_canonical_url(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Append canonical_url + host columns — the dedup/rollup keys."""
    return docs.withColumn("canonical_url", canonical_url(F.col(url_col))) \
               .withColumn("host", url_host(F.col(url_col)))


def latest_snapshot(
    df: DataFrame, key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "warc_ts", tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep only the NEWEST row per key — the re-crawl dedup a Common-Crawl
    corpus needs before extraction (the same url appears once per visit with
    a fresh ``warc_ts``; processing every visit multiplies extraction cost
    and double-counts triples).

    One uniform-key shuffle (row_number over the key window); a groupBy-max +
    self-join would shuffle twice. The hottest key carries exactly the
    snapshot count of the most re-crawled page — bounded by crawl cadence,
    not corpus size. Ties on ``ts_col`` break by ``tiebreak_cols`` DESC so
    the survivor is deterministic under any partitioning.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def html_meta(docs: DataFrame, html_col: str = "html", id_col: str = "url") -> DataFrame:
    """Page-level HTML metadata from the raw ``html:binary`` column, pure
    Catalyst (decode → regexp): the crawl-side gates a web corpus applies
    before extraction — ``noindex`` (the page asked to be excluded),
    ``canonical_href`` (the site's own dedup hint — join it against
    canonical_url to drop alternate-url copies), and ``title``.

    Patterns sit in the Java∩RE2 subset and match case-insensitively via
    (?i) over the ORIGINAL text — lowercasing the document would case-mangle
    the extracted href (breaking the canonical_url join, which preserves
    path case) and the title. Zero shuffles; the parquet scan reads only
    (id, html); decoding goes through the shared charset sniff
    (:func:`~..operators.extract_triples.decoded_html`) — Catalyst
    zero-copy for the valid-UTF-8 majority, sniff UDF for the rest — so a
    GBK page yields the same text here as in extract_text, and a malformed
    page cannot throw (Spark-4 decode('UTF-8') raises on bad bytes).
    """
    from .extract_triples import decoded_html

    h = decoded_html(F.col(html_col))
    return docs.select(
        id_col,
        h.rlike('(?i)<meta[^>]+name="robots"[^>]+content="[^"]*noindex')
        .cast("int").alias("noindex"),
        html_unescape_basic(
            F.regexp_extract(
                h, '(?i)<link[^>]+rel="canonical"[^>]+href="([^"]+)"', 1))
        .alias("canonical_href"),
        html_unescape_basic(
            F.regexp_extract(h, "(?i)<title>([^<]*)</title>", 1))
        .alias("title"),
    )


# <a href="...">anchor</a> — lazy groups; Java∩RE2 subset so the DuckDB
# oracle runs the identical pattern. Dot does not match newlines in either
# engine, so an anchor broken across lines is skipped (documented).
LINK_RX = "(?i)<a[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"

# the references that actually occur in attribute values / anchor text on
# the real web: the five XML-predefined names, the CMS-emitted typographic
# set (curly quotes, dashes, ellipsis \u2014 WordPress writes these as decimal
# refs), and the decimal/hex spellings of each. '&amp;' MUST be the ONLY
# '&'-producing entry and MUST come last: that makes '&amp;lt;'
# single-decode to '&lt;' (browser semantics) and no replacement output
# can ever start a later match — adding '&#38;' here would cascade
# ('&amp;#38;' → '&', browser says '&#38;'), so the numeric spellings of
# '&' stay UNdecoded rather than ever wrongly double-decoded. Arbitrary
# computed charrefs stay a documented gap (Catalyst has no computed-
# replacement regex and char() truncates mod 256; the page TEXT path uses
# the full html.unescape).
_ENTITIES = (("&lt;", "<"), ("&#60;", "<"), ("&gt;", ">"), ("&#62;", ">"),
             ("&quot;", '"'), ("&#34;", '"'),
             ("&#39;", "'"), ("&#x27;", "'"), ("&apos;", "'"),
             ("&nbsp;", "\u00a0"), ("&#160;", "\u00a0"),
             ("&#8216;", "\u2018"), ("&#8217;", "\u2019"),
             ("&#8220;", "\u201c"), ("&#8221;", "\u201d"),
             ("&#8211;", "\u2013"), ("&ndash;", "\u2013"),
             ("&#8212;", "\u2014"), ("&mdash;", "\u2014"),
             ("&#8230;", "\u2026"), ("&hellip;", "\u2026"),
             ("&copy;", "\u00a9"), ("&reg;", "\u00ae"), ("&trade;", "\u2122"),
             ("&amp;", "&"))


def html_unescape_basic(col: Column) -> Column:
    """JVM-side single-pass-equivalent decode of the common named entities
    (round-6: ``href="?a=1&amp;b=2"`` must resolve as ``a=1&b=2`` — every
    server-rendered page ampersand-escapes its query strings)."""
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def resolve_href(base: Column, href: Column) -> Column:
    """RFC 3986 basic reference resolution, pure Catalyst (no ../
    normalization — a crawl frontier tolerates the redundant form):

    * absolute http(s) URLs pass through;
    * protocol-relative ``//host/x`` takes the base's scheme;
    * root-relative ``/x`` joins the base origin;
    * path-relative ``x`` joins the base directory;
    * fragments, empty hrefs and non-http schemes (mailto:, javascript:,
      data:) resolve to NULL — they are not crawl edges.
    """
    scheme = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    origin = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    # base directory: origin + path up to (and incl.) the last '/'; a base
    # with no path segment gets '/'
    path = F.regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    dirpath = F.regexp_replace(path, "[^/]*$", "")
    basedir = F.concat(origin, F.when(dirpath == "", F.lit("/")).otherwise(dirpath))
    is_http_abs = href.rlike("(?i)^https?://")
    has_scheme = href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    return (
        F.when(href.rlike("^(#|$)"), F.lit(None).cast("string"))
        .when(is_http_abs, href)
        .when(has_scheme, F.lit(None).cast("string"))  # mailto:, javascript:, …
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(basedir, href))
    )


def extract_links(docs: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  canonicalize: bool = False) -> DataFrame:
    """The web-graph edge extractor: (page url, html bytes) →
    ``(src, dst, anchor)`` — the crawl-frontier / link-graph feed that
    pagerank and host-level rollups consume (compose with
    :func:`canonical_url` and ``graph.pagerank``).

    Map-only end to end: shared-sniff decode → one regexp_extract_all per
    capture group → arrays_zip → explode → resolution expressions. Zero
    shuffles; the parquet scan reads only (url, html); the valid-UTF-8
    majority never leaves the JVM (see
    :func:`~..operators.extract_triples.decoded_html` — non-UTF-8 and
    malformed pages take the sniff UDF lane instead of throwing). Anchor
    text is inner-tag-stripped and trimmed.

    ``canonicalize=True`` additionally rewrites dst through
    :func:`canonical_url` (dedup key for frontier seen-sets)."""
    from .extract_triples import decoded_html

    h = decoded_html(F.col(html_col))
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(LINK_RX), F.lit(1)).alias("href"),
        F.regexp_extract_all(h, F.lit(LINK_RX), F.lit(2)).alias("anchor"),
    )
    exploded = docs.select(
        F.col(url_col).alias("src"), F.explode(pairs).alias("_l"))
    # entity-decode the attribute value BEFORE resolution (browser order:
    # '?a=1&amp;b=2' is the edge '?a=1&b=2'); anchors decode AFTER the
    # inner-tag strip so a literal '&lt;b&gt;' cannot become a fake tag.
    dst = resolve_href(F.col("src"), html_unescape_basic(F.col("_l.href")))
    if canonicalize:
        dst = canonical_url(dst)
    return (
        exploded.select(
            "src", dst.alias("dst"),
            F.trim(html_unescape_basic(
                F.regexp_replace(F.col("_l.anchor"), "<[^>]+>", "")))
            .alias("anchor"))
        .where(F.col("dst").isNotNull())
    )


# navigation boilerplate that names the LINK, not the target entity —
# dropped before alias mining (lowercased comparison)
GENERIC_ANCHORS = (
    "click here", "here", "read more", "more", "link", "this", "home",
    "next", "previous", "prev", "back", "continue", "continue reading",
    "learn more", "details", "website", "source", "download", "login",
    "sign up", "share", "reply", "permalink", "edit",
)


def anchor_aliases(
    links: DataFrame, min_count: int = 2, top_k: int = 5,
) -> DataFrame:
    """Anchor-text alias mining over the ``(src, dst, anchor)`` link edges:
    the web's native alias evidence — pages that link to an entity's page
    name it in their own words, which is exactly the candidate-alias
    surface J4 entity linking resolves (compose the output with
    ``linking.lsh_candidate_pairs`` / ``verified_alias_pairs``; the
    reference's alias table utils/kg.py is hand-curated, this derives one
    from the corpus itself).

    Per destination url: normalize surfaces (whitespace collapse + trim),
    drop empty / >80-char / navigation-boilerplate anchors, dedup per
    referring page so one hub repeating a link 50× counts once, then count
    DISTINCT REFERRING PAGES per (dst, alias) — the standard anti-spam
    weighting — and keep the ``top_k`` by count per dst
    (deterministic tiebreak on the alias string).

    Two uniform shuffles: the (src,dst,alias) dedup-aggregate and the
    per-dst top-k window; the ``min_count`` filter runs before the window
    so singleton long-tail aliases (most of the volume at web scale) never
    enter the skew-sensitive per-dst partition step."""
    from pyspark.sql import Window

    alias = F.trim(F.regexp_replace(F.col("anchor"), "\\s+", " "))
    cleaned = (
        links.select("src", "dst", alias.alias("alias"))
        .where((F.length("alias") > 0) & (F.length("alias") <= 80))
        .where(~F.lower(F.col("alias")).isin(*GENERIC_ANCHORS))
        .dropDuplicates(["src", "dst", "alias"])
    )
    counts = (
        cleaned.groupBy("dst", "alias")
        .agg(F.count(F.lit(1)).alias("n_refs"))  # distinct src by construction
        .where(F.col("n_refs") >= min_count)
    )
    w = Window.partitionBy("dst").orderBy(F.col("n_refs").desc(), F.col("alias"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def _robots_pattern_rx(rule: Column) -> Column:
    """robots.txt path pattern → anchored regex, pure Catalyst: escape the
    regex metacharacters, then ``*`` → ``.*`` and a TRAILING ``$`` →
    end-anchor (REP wildcard subset, RFC 9309 §2.2.3). Escapes backslash
    first so later escapes aren't double-escaped; the DuckDB oracle builds
    the identical string, so both engines run the same pattern."""
    ends = rule.endswith("$")
    body = F.when(ends, F.substring(rule, 1, F.length(rule) - 1)).otherwise(rule)
    for ch in "\\.+?()[]{}^$|":
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), body, F.when(ends, F.lit("$")).otherwise(F.lit("")))


# every rule key RFC 9309 (+ the de-facto crawl-delay extension) recognizes
# as ending a run of User-agent lines — group boundaries MUST be computed
# over all of them, not just the keys a particular caller extracts:
# filtering first can make two UA blocks adjacent and wrongly merge them
# (round-6 review: a star group's rules preceding a per-agent Crawl-delay
# group attributed that delay to *).
_ROBOTS_RULE_KEYS = ("allow", "disallow", "crawl-delay")


def _robots_star_groups(
    robots: DataFrame, host_col: str, body_col: str,
    extra_keys: tuple[str, ...], agent: str = "*",
):
    """Shared robots.txt line parse: comment strip, key/value split, the
    running-sum group ids, and the set of groups that apply to ``agent``.
    Returns (grouped lines restricted to user-agent + ``extra_keys``,
    applicable group ids).

    Group boundaries follow RFC 9309 §2.2.1: a group is a run of
    consecutive ``User-agent`` lines plus the rule lines that follow; any
    recognized rule line (Allow / Disallow / Crawl-delay) ends the UA run,
    so boundaries are computed over ALL recognized keys before filtering
    to the caller's keys of interest.

    Group selection (RFC 9309 §2.2.1 "most specific match"): for the
    default ``agent='*'`` only literal ``User-agent: *`` groups apply.
    For a named crawler product token, a group's UA value matches when it
    is a case-insensitive prefix of the token (the google/robotstxt
    convention); the longest matching value wins, ``*`` groups (match
    length 0) apply only when no named group matches."""
    from pyspark.sql import Window

    unknown = set(extra_keys) - set(_ROBOTS_RULE_KEYS)
    if unknown:
        # the line parse pre-filters to the recognized key set (boundary
        # correctness requires it); an unrecognized extra_key would
        # silently return zero rows — fail loudly instead (round-7 review)
        raise ValueError(
            f"_robots_star_groups: unrecognized extra_keys {sorted(unknown)}"
            f" — recognized rule keys are {_ROBOTS_RULE_KEYS}; extend"
            " _ROBOTS_RULE_KEYS to add a directive")

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("ln", "raw"))
    parsed = lines.select(
        "host", "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).select(
        "host", "ln",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key").isin("user-agent", *_ROBOTS_RULE_KEYS))
    wseq = Window.partitionBy("host").orderBy("ln")
    grouped = parsed.withColumn(
        "new_group",
        ((F.col("key") == "user-agent")
         & (F.coalesce(F.lag("key").over(wseq), F.lit("")) != "user-agent"))
        .cast("int"),
    ).withColumn("gid", F.sum("new_group").over(wseq))
    ua = grouped.where(F.col("key") == "user-agent")
    if agent == "*":
        sel_groups = (
            ua.where(F.col("value") == "*").select("host", "gid").distinct())
    else:
        token = agent.lower()
        spec = F.when(F.col("value") == "*", F.lit(0)).otherwise(
            F.when(F.lit(token).startswith(F.lower(F.col("value"))),
                   F.length("value")))
        matched = ua.select("host", "gid", spec.alias("spec")).where(
            F.col("spec").isNotNull())
        whost = Window.partitionBy("host")
        sel_groups = (
            matched.withColumn("best", F.max("spec").over(whost))
            .where(F.col("spec") == F.col("best"))
            .select("host", "gid").distinct())
    wanted = ("user-agent", *extra_keys)
    return grouped.where(F.col("key").isin(*wanted)), sel_groups


def robots_crawl_delay(
    robots: DataFrame, host_col: str = "host", body_col: str = "body",
    default_ms: int = -1, agent: str = "*",
) -> DataFrame:
    """Per-host ``Crawl-delay`` from the groups applying to ``agent``
    (default: the ``User-agent: *`` groups) → ``(host, crawl_delay_ms)``
    — the de-facto (non-RFC-9309, but near-universal) politeness knob a
    fetch scheduler rates-limits by. A named ``agent`` selects the
    longest-prefix-matching UA group, falling back to ``*`` (RFC 9309
    §2.2.1 specificity). Seconds may be fractional ("0.5"); unparsable or
    absent values fall back to ``default_ms`` (-1 sentinel, repo rule: no
    NULL-able ints). Multiple applicable groups: the most conservative
    (largest) delay wins."""
    grouped, star_groups = _robots_star_groups(
        robots, host_col, body_col, extra_keys=("crawl-delay",), agent=agent)
    delays = (
        grouped.where(F.col("key") == "crawl-delay")
        .join(star_groups, ["host", "gid"], "left_semi")
        .select(
            "host",
            (F.expr("try_cast(value AS DOUBLE)") * 1000)
            .cast("bigint").alias("_ms"))
        .groupBy("host")
        .agg(F.max("_ms").alias("_ms"))
    )
    hosts = robots.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(delays, "host", "left").select(
        "host",
        F.coalesce(F.col("_ms"), F.lit(default_ms)).alias("crawl_delay_ms"))


def robots_rules(
    robots: DataFrame, host_col: str = "host", body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """robots.txt bodies → one row per applicable group rule:
    ``(host, rule, allow, rule_len, rule_rx)`` — the politeness table a
    crawl frontier joins against before scheduling (RFC 9309 grammar
    subset, documented: ``#`` comments stripped, keys case-insensitive,
    a group = consecutive User-agent lines + following rule lines; the
    default ``agent='*'`` keeps only groups naming ``*``, a named crawler
    product token selects its longest-prefix-matching UA groups and falls
    back to ``*`` only when no named group matches — RFC 9309 §2.2.1; the
    empty ``Disallow:`` (allow-all) contributes no rule).

    Line-state parsing ("which group does this rule line belong to?") is a
    running sum over the line sequence: a User-agent line whose PREVIOUS
    line is not also a User-agent line starts a new group, so the group id
    is the windowed count of such starts — sequence semantics without any
    per-row Python. Both windows partition by host (one shuffle; robots
    tables are one row per host, orders of magnitude smaller than the
    frontier they gate)."""
    grouped, star_groups = _robots_star_groups(
        robots, host_col, body_col, extra_keys=("allow", "disallow"),
        agent=agent)
    rules = (
        grouped.where(F.col("key").isin("allow", "disallow")
                      & (F.col("value") != ""))
        .join(star_groups, ["host", "gid"], "left_semi")
        .select(
            "host",
            F.col("value").alias("rule"),
            (F.col("key") == "allow").cast("int").alias("allow"))
        .distinct()
    )
    return rules.select(
        "host", "rule", "allow",
        F.length("rule").alias("rule_len"),
        _robots_pattern_rx(F.col("rule")).alias("rule_rx"))


def frontier_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url",
) -> DataFrame:
    """Gate frontier urls through the robots rule table: longest-match
    precedence (RFC 9309 §2.2.2 — the most specific rule, by raw rule
    length, wins; a tie prefers Allow), allowed when no rule matches.
    Output: the input row + ``allowed`` (int) + ``matched_rule`` ('' when
    none) for auditability.

    One shuffle join on host (hint ``broadcast(rules)`` upstream when the
    politeness table fits — it usually does: hosts × dozens of rules);
    the per-url argmax is a groupBy over the join output keyed by url —
    uniform unless one url repeats, which the frontier's first-seen dedup
    upstream already guarantees against.

    Matching operates on path-AND-query (RFC 9309 §2.2.2's match target):
    real robots files commonly write ``Disallow: /search?q=`` or
    ``/*?sort=`` — path-only matching would fetch explicitly disallowed
    urls (round-6 review)."""
    query = F.parse_url(F.col(url_col), F.lit("QUERY"))
    u = urls.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path",
        F.concat(
            F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")),
                       F.lit("/")),
            F.when(query.isNotNull(), F.concat(F.lit("?"), query))
            .otherwise(F.lit(""))))
    j = u.join(rules, u["_host"] == rules["host"], "left")
    matched = j.withColumn(
        "_hit", F.expr("_path RLIKE rule_rx").cast("boolean") & F.col("rule").isNotNull())
    best = (
        matched.groupBy(url_col)
        .agg(F.max_by(
            F.struct(F.col("allow"), F.col("rule")),
            # rule string as the final tiebreaker: two matching rules of
            # equal length and polarity must yield a deterministic
            # matched_rule across runs/engines (round-6 review)
            F.when(F.col("_hit"),
                   F.struct(F.col("rule_len"), F.col("allow"),
                            F.col("rule")))).alias("_best"))
        .select(
            url_col,
            F.coalesce(F.col("_best.allow"), F.lit(1)).alias("allowed"),
            F.coalesce(F.col("_best.rule"), F.lit("")).alias("matched_rule"))
    )
    return urls.join(best, url_col)


def schedule_fetches(
    urls: DataFrame, delays: DataFrame | None = None,
    default_delay_ms: int = 1000, horizon_start_ms: int = 0,
    max_per_host: int | None = None, oversample: int = 4,
    url_col: str = "url",
) -> DataFrame:
    """Politeness-aware fetch scheduling — the step after
    ``frontier_allowed`` gating and ``robots_crawl_delay`` extraction: each
    host's pending urls get FIFO slots spaced by the host's Crawl-delay,
    so a fetcher can consume ``scheduled_ms`` order directly and never
    violate per-host politeness. Output: input row + ``host``, ``slot``
    (0-based per host), ``delay_ms``, ``scheduled_ms`` (= horizon_start +
    slot·delay).

    Slot priority is the url's uniform md5 hash (tie-broken by the url):
    deterministic, engine-reproducible, and the standard crawl-order
    randomization — lexicographic order would walk one directory subtree
    at a time.

    ``max_per_host`` bounds one scheduling cycle per host (re-crawl
    pressure control AND the skew bound): hosts over the cap are first
    cut by a broadcast hash THRESHOLD (keep hash < space·cap·oversample/n
    — map-side, no shuffle of the big side beyond the host count agg), so
    the exact per-host rank window then runs over ≈cap·oversample rows
    per host instead of the host's full pending list — a 10⁷-url head
    host never becomes one unsplittable sort task. The threshold is a
    uniform random cut, so the final cap keeps an unbiased sample; with
    ``oversample=4`` the chance of under-filling a cap-100 cycle is
    ~1e-12 (Chernoff). Without a cap the window runs per host unbounded —
    fine for frontier slices, documented skew risk at full-table scale.

    ``delays`` is a ``robots_crawl_delay``-shaped table (host,
    crawl_delay_ms; -1 sentinel → ``default_delay_ms``), broadcast —
    politeness tables are tiny next to the frontier.

    The output columns ``host``/``slot``/``delay_ms``/``scheduled_ms``
    are RESERVED: an input already carrying one (a frontier slice keyed
    by host is natural) would otherwise emit an ambiguous duplicate
    column, so such inputs' copies are dropped from the passthrough —
    the emitted ``host`` is always the one recomputed from ``url_col``
    (round-7 review)."""
    from pyspark.sql import Window

    from .sampling import _uniform_hash

    HASH_SPACE = 1 << 32
    reserved = ("host", "slot", "delay_ms", "scheduled_ms")
    passthrough = [c for c in urls.columns if c not in reserved]
    urls = urls.select(*passthrough)
    u = urls.withColumn("host", url_host(F.col(url_col))) \
        .withColumn("_rk", _uniform_hash(url_col))
    if max_per_host is not None:
        counts = u.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
        # explicit floor: a bare bigint cast TRUNCATES in Spark while the
        # DuckDB mirror's CAST ROUNDS — an off-by-one threshold that drops
        # a url whose hash lands exactly on the boundary (repo rule;
        # round-7 review, confirmed empirically at nh=200)
        thr = F.floor(F.least(
            F.lit(float(HASH_SPACE)),
            (F.lit(HASH_SPACE) * F.lit(max_per_host) * F.lit(oversample))
            / F.col("_n"))).cast("bigint")
        u = (u.join(F.broadcast(counts), "host")
             .where(F.col("_rk") < thr).drop("_n"))
    w = Window.partitionBy("host").orderBy("_rk", url_col)
    ranked = u.withColumn("slot", F.row_number().over(w) - 1)
    if max_per_host is not None:
        ranked = ranked.where(F.col("slot") < max_per_host)
    if delays is not None:
        d = F.broadcast(delays.select(
            "host",
            F.when(F.col("crawl_delay_ms") >= 0, F.col("crawl_delay_ms"))
            .otherwise(F.lit(default_delay_ms)).alias("_delay")))
        ranked = ranked.join(d, "host", "left")
    else:
        ranked = ranked.withColumn("_delay", F.lit(None).cast("bigint"))
    return ranked.select(
        *passthrough, "host",
        F.col("slot").cast("bigint").alias("slot"),
        F.coalesce(F.col("_delay"), F.lit(default_delay_ms))
        .cast("bigint").alias("delay_ms"),
        (F.lit(horizon_start_ms)
         + F.col("slot") * F.coalesce(F.col("_delay"),
                                      F.lit(default_delay_ms)))
        .cast("bigint").alias("scheduled_ms"))


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", body_col: str = "body",
) -> DataFrame:
    """``Sitemap:`` records from robots.txt bodies → ``(host,
    sitemap_url)`` — the crawl-seed discovery channel next to the link
    graph. Sitemap lines are host-level, NOT group-scoped (RFC 9309 §2.3
    "other records": they apply regardless of User-agent), so this is a
    plain line parse — comment strip, case-insensitive key, absolute-url
    values only (the spec requires absolute) — with no group windows at
    all: one explode + filter, zero shuffle before the distinct."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\r?\n")).alias("raw"))
    parsed = lines.select(
        "host",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).select(
        "host",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("value"),
    )
    return (
        parsed.where((F.col("key") == "sitemap")
                     & F.col("value").rlike("^https?://"))
        .select("host", F.col("value").alias("sitemap_url"))
        .dropDuplicates()
    )


def canonical_dedup(
    docs: DataFrame, html_col: str = "html", url_col: str = "url",
    materialize: bool = True,
) -> DataFrame:
    """Collapse ``rel=canonical`` alternate pages — the crawl-side dedup
    ``html_meta`` extracts the hint for: every page's dedup key is its
    declared canonical target (absolute hrefs only, the common case;
    relative/absent declarations fall back to the page's own
    canonical_url), and per target ONE representative survives — the
    page that IS the target when crawled (its own canonical_url equals
    the key), else the lexicographically-smallest alternate.

    Output: input ``url`` + ``canon_key`` + ``keep`` (int) — compose
    upstream of extraction so mirror urls of one article don't
    double-count triple evidence.

    Scale shape follows paragraph_dedup's lesson: the survivor is a
    combinable ``min(struct)`` groupBy on the canonical key, NOT a
    window — the hottest canonical target (a site-wide boilerplate
    canonical) would otherwise be one unsplittable task."""
    from .extract_triples import decoded_html

    href = F.regexp_extract(
        decoded_html(F.col(html_col)),
        '(?i)<link[^>]+rel="canonical"[^>]+href="([^"]+)"', 1)
    href = html_unescape_basic(href)
    own = canonical_url(F.col(url_col))
    keyed = docs.select(
        F.col(url_col).alias("url"),
        F.when(href.rlike("^https?://"), canonical_url(href))
        .otherwise(own).alias("canon_key"),
        (own == F.when(href.rlike("^https?://"), canonical_url(href))
         .otherwise(own)).cast("int").alias("_is_self"),
    )
    if materialize:
        # keyed feeds BOTH the winner aggregation and the join back — without
        # this the whole html decode (incl. the Arrow slow lane) + regex +
        # URL-parse chain runs twice (round-6 'no subtree consumed twice'
        # lesson). The stored rows are narrow (url, key, flag).
        keyed = keyed.localCheckpoint(eager=False)
    winners = keyed.groupBy("canon_key").agg(
        F.min(F.struct((1 - F.col("_is_self")).alias("ns"),
                       F.col("url").alias("u"))).alias("_w"))
    return (
        keyed.join(winners, "canon_key")
        .select("url", "canon_key",
                (F.col("url") == F.col("_w.u")).cast("int").alias("keep"))
    )

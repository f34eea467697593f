"""Curation-family operators: repetition scores, PII, paragraph dedup,
benchmark decontamination (operators/curation.py)."""

import pytest

from relation_extraction_spark.operators.curation import (
    decontaminate,
    decontaminate_excise,
    paragraph_dedup,
    pii_redact,
    pii_stats,
    repetition_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_repetition_scores_planted(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_scores(_docs(spark, [(1, "a a a a b"), (2, "solo")])).collect()
    }
    r1 = out[1]
    assert r1["n_words"] == 5
    assert r1["dup_word_frac"] == pytest.approx(1 - 2 / 5)
    # bigrams: [a a, a a, a a, a b] -> top covers 3/4
    assert r1["top_gram_frac"] == pytest.approx(0.75)
    r2 = out[2]
    assert r2["n_words"] == 1
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_gram_frac"] == 0.0  # no bigram exists


def test_pii_stats_and_redact(spark):
    text = "write bob.smith+1@mail.example.org from 10.0.0.1 or call +86 138-1234 now"
    docs = _docs(spark, [(1, text), (2, "no pii here")])
    stats = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (stats[1]["n_emails"], stats[1]["n_ipv4"], stats[1]["n_phones"]) == (1, 1, 1)
    assert (stats[2]["n_emails"], stats[2]["n_ipv4"], stats[2]["n_phones"]) == (0, 0, 0)
    red = {r["doc_id"]: r["clean_text"] for r in pii_redact(docs).collect()}
    assert red[1] == "write <EMAIL> from <IP> or call <PHONE> now"
    assert red[2] == "no pii here"


def test_paragraph_dedup_first_seen_and_reassembly(spark):
    docs = _docs(
        spark,
        [
            (1, "intro\nBOILER\nbody one"),
            (2, "BOILER\nbody two"),
            (3, "body three\n boiler "),  # case/whitespace-normalized match
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["text_kept"] == "intro\nBOILER\nbody one"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (3, 0)
    assert out[2]["text_kept"] == "body two"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)
    assert out[3]["text_kept"] == "body three"
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (1, 1)


def test_paragraph_dedup_partition_invariant(spark):
    rows = [(i, f"common header\nunique body {i}\nshared footer {i % 3}") for i in range(40)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, paragraph_dedup(docs.repartition(1)).collect()))
    b = sorted(map(tuple, paragraph_dedup(docs.repartition(7)).collect()))
    assert a == b
    # exactly one copy of the header and of each footer variant survives
    kept_all = "\n".join(t for _, t, _, _ in a)
    assert kept_all.count("common header") == 1
    for k in range(3):
        assert kept_all.count(f"shared footer {k}") == 1


def test_facade_curate_chain(spark):
    from relation_extraction_spark.api import KGEngine

    docs = _docs(
        spark,
        [
            # survives every gate, pii gets scrubbed
            (1, "the fox and a dog run to the barn and it is that they nap for hours\nmail bob@x.org"),
            (2, "the fox and a dog run to the barn and it is that they nap for hours\nmail bob@x.org"),  # exact dup of 1
            (3, "spam spam spam spam spam spam spam spam spam spam"),  # repetition gate
            (4, "the sly cat naps in a warm sunny spot and it is that the day for rest is here"),
            (5, "leak the secret eval answer is forty two exactly here now ok"),  # decontaminated
        ],
    )
    bench = spark.createDataFrame(
        [("the secret eval answer is forty two exactly",)], "text string")
    out = {r["doc_id"]: r["text"]
           for r in KGEngine(spark).curate(docs, benchmark=bench,
                                           decontaminate_n=8).collect()}
    assert set(out) == {1, 4}
    assert "<EMAIL>" in out[1] and "bob@x.org" not in out[1]


def test_paragraph_dedup_literal_separator(spark):
    """sep is used literally on BOTH the split and the reassembly side,
    even when it is a regex metacharacter."""
    docs = _docs(spark, [(1, "a|b|a"), (2, "b|c")])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, sep="|").collect()}
    assert out[1]["text_kept"] == "a|b|a" or out[1]["text_kept"] == "a|b"
    # 'a' appears twice in doc 1: global first-seen keeps only pos 0
    assert out[1]["text_kept"] == "a|b"
    assert out[2]["text_kept"] == "c"


def test_latest_snapshot_keeps_newest_visit(spark):
    import datetime as dt

    from relation_extraction_spark.operators.web import latest_snapshot

    t = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t, b"old", "v1"),
        ("u1", t + dt.timedelta(days=3), b"new", "v2"),
        ("u2", t, b"only", "v1"),
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string")
    out = {r["url"]: r for r in latest_snapshot(docs).collect()}
    assert out["u1"]["text"] == "v2" and out["u2"]["text"] == "v1"
    a = sorted((r["url"], r["text"]) for r in latest_snapshot(docs.repartition(5)).collect())
    assert a == [("u1", "v2"), ("u2", "v1")]


def _paragraph_dedup_mirror(rows, sep="\n"):
    """Independent python reimplementation of global first-seen dedup."""
    seen = {}
    pars_by_doc = {}
    for doc_id, text in sorted(rows):
        pars = [p for p in text.split(sep) if p.strip()]
        pars_by_doc[doc_id] = pars
    for doc_id in sorted(pars_by_doc):
        for pos, p in enumerate(pars_by_doc[doc_id]):
            seen.setdefault(p.strip().lower(), (doc_id, pos))
    out = {}
    for doc_id, pars in pars_by_doc.items():
        if not pars:
            continue
        kept = [p for pos, p in enumerate(pars)
                if seen[p.strip().lower()] == (doc_id, pos)]
        out[doc_id] = (sep.join(kept), len(kept), len(pars) - len(kept))
    return out


def test_paragraph_dedup_matches_python_mirror(spark):
    import random

    rng = random.Random(20260817)
    pool = [f"para {i} with words" for i in range(15)]
    rows = [
        (d, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 6))))
        for d in range(60)
    ]
    got = {r["doc_id"]: (r["text_kept"], r["n_kept"], r["n_dropped"])
           for r in paragraph_dedup(_docs(spark, rows)).collect()}
    assert got == _paragraph_dedup_mirror(rows)


def test_paragraph_dedup_hot_boilerplate(spark):
    """20k docs all sharing one boilerplate paragraph: exactly one copy
    survives (in the smallest doc id) and every unique body is kept — the
    hot-key shape the combinable-min design exists for."""
    rows = [(i, f"unique body {i}\nSHARED FOOTER") for i in range(20000)]
    out = paragraph_dedup(_docs(spark, rows))
    from pyspark.sql import functions as F

    agg = out.agg(F.sum("n_kept"), F.sum("n_dropped")).collect()[0]
    assert (agg[0], agg[1]) == (20001, 19999)
    first = out.where("doc_id = 0").collect()[0]
    assert first["text_kept"] == "unique body 0\nSHARED FOOTER"


def test_sessionize_matches_python_mirror(spark):
    import datetime as dt
    import random

    from relation_extraction_spark.operators.sessions import sessionize

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for eid in range(150):
        rows.append((eid, t0 + dt.timedelta(minutes=rng.randint(0, 2000)),
                     rng.randint(0, 7)))
    e = spark.createDataFrame(rows, "event_id int, ts timestamp, user_id int")
    got = {r["event_id"]: r["session_no"]
           for r in sessionize(e, gap_seconds=1800).collect()}
    # independent mirror
    by_user = {}
    for eid, ts, u in rows:
        by_user.setdefault(u, []).append((ts, eid))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sess, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sess += 1
            want[eid] = sess
            prev = ts
    assert got == want


def test_boilerplate_filter_df_threshold(spark):
    from relation_extraction_spark.operators.curation import boilerplate_filter

    docs = _docs(
        spark,
        [
            (1, "HEADER\nbody one\nfooter"),
            (2, "HEADER\nbody two\nfooter"),
            (3, "header \nbody three"),  # normalized match -> df(header)=3
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_filter(docs, max_df=2).collect()}
    # header df=3 > 2: dropped from ALL docs; footer df=2 <= 2: kept in both
    assert out[1]["text_kept"] == "body one\nfooter"
    assert out[2]["text_kept"] == "body two\nfooter"
    assert out[3]["text_kept"] == "body three"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 1)
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (1, 1)


def test_decontaminate_excise(spark):
    from relation_extraction_spark.operators.curation import decontaminate_excise

    docs = _docs(
        spark,
        [
            (1, "a x y z b"),   # overlapping hits "x y z" + "y z b" -> keep "a"
            (2, "p  q   r"),    # clean: whitespace-normalized passthrough
            (3, "x y z"),       # fully covered -> empty
            (4, "x y"),         # shorter than n: cannot be excised
        ],
    )
    bench = spark.createDataFrame([("x y z",), ("y z b",)], "text string")
    out = {r["doc_id"]: r for r in decontaminate_excise(docs, bench, n=3).collect()}
    assert out[1]["clean_text"] == "a" and out[1]["n_removed_words"] == 4
    assert out[2]["clean_text"] == "p q r" and out[2]["n_removed_words"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_removed_words"] == 3
    assert out[4]["clean_text"] == "x y" and out[4]["n_removed_words"] == 0


def test_html_meta_flags(spark):
    from relation_extraction_spark.operators.web import html_meta

    rows = [
        ("u1", ('<html><head><title>My Page</title>'
                '<meta name="robots" content="NOINDEX,nofollow">'
                '<link rel="canonical" href="https://ex.com/Article-A">'
                "</head><body>x</body></html>").encode()),
        ("u2", b"<html><head><title>Other</title></head><body>y</body></html>"),
        ("u3", b"<html><body>no head</body></html>"),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in html_meta(docs).collect()}
    assert out["u1"]["noindex"] == 1  # noindex detected case-insensitively
    assert out["u1"]["canonical_href"] == "https://ex.com/Article-A"  # case kept
    assert out["u1"]["title"] == "My Page"  # original case preserved
    assert out["u2"]["noindex"] == 0 and out["u2"]["title"] == "Other"
    assert out["u3"]["canonical_href"] == "" and out["u3"]["title"] == ""


def test_decontaminate_flags_overlap(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha x y z beta"),  # contains the benchmark 3-gram
            (2, "alpha beta gamma delta"),  # clean
            (3, "x y"),  # shorter than n: whole-text gram rule
        ],
    )
    bench = spark.createDataFrame([("x y z",), ("x y",)], "text string")
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert (out[1]["n_hits"], out[1]["contaminated"]) == (1, 1)
    assert (out[2]["n_hits"], out[2]["contaminated"]) == (0, 0)
    assert (out[3]["n_hits"], out[3]["contaminated"]) == (1, 1)


def test_decontaminate_blank_text_never_matches(spark):
    """Blank/whitespace-only text yields NO grams: a blank benchmark row
    must not flag blank documents (the empty-string gram _words produces on
    '' would otherwise 'overlap' every blank doc), and two blank docs share
    nothing in the excision path either."""
    docs = _docs(spark, [(1, ""), (2, "   "), (3, "alpha beta")])
    bench = spark.createDataFrame([("",), ("  ",)], "text string")
    out = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(docs, bench, n=3).collect()}
    assert out == {1: 0, 2: 0, 3: 0}
    ex = {r["doc_id"]: r["n_removed_words"]
          for r in decontaminate_excise(docs, bench, n=3).collect()}
    assert ex == {1: 0, 2: 0, 3: 0}

def test_html_surfaces_share_charset_sniff(spark):
    """round-5 verdict #3: a GBK / UTF-16 / malformed-UTF-8 page must yield
    consistent text across ALL html surfaces — extract_text, html_meta and
    extract_links share one sniff-then-decode. Before round 6, meta+links
    decoded blind UTF-8: GBK pages gave mangled hrefs/titles, and Spark-4
    decode('UTF-8') outright threw on malformed bytes."""
    from relation_extraction_spark.operators.extract_triples import (
        extract_text_bytes,
    )
    from relation_extraction_spark.operators.web import extract_links, html_meta

    gbk = ('<html><head><meta charset=gbk><title>中文标题</title>'
           '<link rel="canonical" href="https://ex.cn/文章">'
           '</head><body><a href="/下一页">下一页</a></body></html>').encode("gbk")
    u16 = ('<html><head><title>wide</title></head>'
           '<body><a href="/w">wlink</a></body></html>').encode("utf-16")  # BOM'd
    bad = (b'<html><head><title>br\xff ok</title></head>'
           b'<body><a href="/b">z</a></body></html>')  # malformed utf-8
    docs = spark.createDataFrame(
        [("https://ex.cn/p", gbk), ("https://w.example/p", u16),
         ("https://b.example/p", bad)],
        "url string, html binary")

    meta = {r["url"]: r for r in html_meta(docs).collect()}
    assert meta["https://ex.cn/p"]["title"] == "中文标题"
    assert meta["https://ex.cn/p"]["canonical_href"] == "https://ex.cn/文章"
    assert meta["https://w.example/p"]["title"] == "wide"
    assert meta["https://b.example/p"]["title"] == "br� ok"  # no throw

    links = {r["src"]: r for r in extract_links(docs).collect()}
    assert links["https://ex.cn/p"]["dst"] == "https://ex.cn/下一页"
    assert links["https://ex.cn/p"]["anchor"] == "下一页"
    assert links["https://w.example/p"]["dst"] == "https://w.example/w"
    assert links["https://b.example/p"]["dst"] == "https://b.example/b"

    # the text front door agrees (same sniff): GBK body text round-trips
    assert "下一页" in extract_text_bytes(gbk)
    assert extract_text_bytes(u16) == "wlink"


def test_html_entities_decoded_in_links_and_meta(spark):
    """round 6: attribute values and anchor/title text entity-decode like a
    browser — '?a=1&amp;b=2' is the edge '?a=1&b=2', '&amp;lt;' single-
    decodes to '&lt;' (never double), and a literal '&lt;b&gt;' in anchor
    text must NOT become a strippable fake tag."""
    from relation_extraction_spark.operators.web import extract_links, html_meta

    page = ('<html><head><title>A &amp; B &lt;tm&gt;</title>'
            '<link rel="canonical" href="https://ex.com/p?x=1&amp;y=2">'
            '</head><body>'
            '<a href="/s?a=1&amp;b=2&amp;c=%20d">one &amp; two</a>'
            '<a href="/amp">lit &amp;lt; stays</a>'
            '<a href="/tag">&lt;b&gt;not bold&lt;/b&gt;</a>'
            '<a href="/nb">a&nbsp;b&#39;s</a>'
            '</body></html>').encode()
    docs = spark.createDataFrame([("https://ex.com/p", page)],
                                 "url string, html binary")

    meta = html_meta(docs).collect()[0]
    assert meta["title"] == "A & B <tm>"
    assert meta["canonical_href"] == "https://ex.com/p?x=1&y=2"

    links = {r["dst"]: r["anchor"] for r in extract_links(docs).collect()}
    assert links["https://ex.com/s?a=1&b=2&c=%20d"] == "one & two"
    assert links["https://ex.com/amp"] == "lit &lt; stays"  # single decode
    assert links["https://ex.com/tag"] == "<b>not bold</b>"  # decoded AFTER strip
    assert links["https://ex.com/nb"] == "a\xa0b's"  # U+00A0, not space


def test_html_numeric_and_typographic_refs(spark):
    """round 6: the CMS-emitted typographic set decodes (curly quotes,
    dashes, ellipsis — WordPress writes these as decimal refs), and the
    numeric spellings of '&' deliberately stay UNdecoded: decoding them in
    a chained replace would cascade ('&amp;#38;' must stay '&#38;' like a
    browser, never become '&')."""
    from relation_extraction_spark.operators.web import extract_links

    page = ('<html><body>'
            '<a href="/q">It&#8217;s &#8220;here&#8221; &#8211; now&hellip;</a>'
            '<a href="/amp38">x &amp;#38; y</a>'
            '<a href="/raw38">a &#38; b</a>'
            '</body></html>').encode()
    docs = spark.createDataFrame([("https://ex.com/p", page)],
                                 "url string, html binary")
    links = {r["dst"]: r["anchor"] for r in extract_links(docs).collect()}
    assert links["https://ex.com/q"] == "It\u2019s \u201chere\u201d \u2013 now\u2026"
    assert links["https://ex.com/amp38"] == "x &#38; y"  # no double decode
    assert links["https://ex.com/raw38"] == "a &#38; b"  # documented gap


def test_gopher_flags_rules(spark):
    """Each Gopher A1.1 rule flips gopher_pass on the doc that violates
    exactly it; ratios are integer micro-units."""
    from relation_extraction_spark.operators.curation import gopher_flags

    good = ("the data pipeline runs well and scales with the cluster "
            "because that design have good bones for the workload")
    rows = [
        (0, good),                                         # passes all
        (1, "tiny doc of the and that"),                   # < min_words
        (2, good + " ###### #### ##### ### ## ## ## ## ##"),  # symbols
        (3, "\n".join("- bullet line of the list" for _ in range(10))
            + "\nthe only prose line that have text with it and more "
              "words to cross the minimum threshold here now"),
        (4, good.replace("the", "000").replace("and", "111")
             .replace("that", "222").replace("have", "333")
             .replace("with", "444")),                     # no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r.asDict()
           for r in gopher_flags(docs, min_words=15).collect()}
    assert out[0]["gopher_pass"] == 1
    assert out[1]["gopher_pass"] == 0 and out[1]["n_words"] < 15
    assert out[2]["gopher_pass"] == 0
    assert out[2]["symbol_ratio_micro"] >= 100_000
    assert out[3]["gopher_pass"] == 0
    assert out[3]["bullet_ratio_micro"] >= 900_000
    assert out[4]["gopher_pass"] == 0 and out[4]["n_stop_distinct"] < 2
    # micro-unit exactness: 4 words x {3,4,5,4} chars -> mean 4.0
    [r] = gopher_flags(
        spark.createDataFrame([(9, "abc abcd abcde abcd")],
                              "doc_id int, text string"),
        min_words=1).collect()
    assert r["mean_wlen_micro"] == 4_000_000


def test_curate_docs_gopher_gate(spark):
    """gopher=True adds the A1.1 gate after paragraph dedup: a doc that
    passes the historical quality/repetition gates but fails a Gopher
    rule (no required stopwords) is dropped; the default chain keeps it
    (off-by-default semantics preserved)."""
    from relation_extraction_spark.operators.curation import curate_docs

    good = ("the data pipeline runs well and scales with the cluster "
            "because that design have good bones for the workload today")
    no_stop = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lam mu nu xi omicron pi rho sigma tau upsilon")
    docs = spark.createDataFrame(
        [(1, good), (2, no_stop)], "doc_id int, text string")
    base = {r["doc_id"] for r in
            curate_docs(docs, min_quality=0.0).collect()}
    assert base == {1, 2}
    gated = {r["doc_id"] for r in
             curate_docs(docs, min_quality=0.0, gopher=True,
                         gopher_min_words=10).collect()}
    assert gated == {1}

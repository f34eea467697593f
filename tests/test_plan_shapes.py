"""Physical-plan shape guards: the perf properties the round verdicts audit
(no shuffle in the fused extract, no unbounded collect_set gathers, no
fan-out membership joins) are asserted here so a regression fails CI, not a
benchmark eyeball."""

import io
import contextlib

import pyspark.sql.functions as F

from relation_extraction_spark.operators.extract_triples import (
    extract_text_df,
    extract_triples,
)
from relation_extraction_spark.operators.kg import fix_spo, kg_edges, with_in_kg
from relation_extraction_spark.synthetic import documents_df, gold_triples_df


def plan_of(df, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_fused_extract_has_no_exchange(spark):
    """The flagship extraction path is ONE map-only Arrow pipeline: a shuffle
    appearing here would 100x the cost at corpus scale."""
    docs = extract_text_df(documents_df(spark, 50))
    p = plan_of(extract_triples(docs), "formatted")
    assert "Exchange" not in p, p


def test_fix_spo_plan_has_no_collect_set(spark):
    """Candidate gathering must stay a distinct-edge equi-join — a
    collect_set over (subject|object, predicate) rebuilds the hub-entity
    array-row hazard (VERDICT r02 item 1)."""
    gold = gold_triples_df(spark, 100)
    p = plan_of(fix_spo(gold, kg_edges(gold)))
    assert "collect_set" not in p, p


def test_with_in_kg_single_join_no_reagg(spark):
    """Membership is a 3-key existence join: exactly one join over the triple
    side and no groupBy-max re-aggregation of the triple columns."""
    gold = gold_triples_df(spark, 100)
    p = plan_of(with_in_kg(gold, kg_edges(gold)))
    # aggregates may appear only for the KG-side dedup (keyed, functionless),
    # never a max() re-aggregation collapsing a fan-out join
    assert "max(" not in p.lower(), p
    assert p.count("Join") >= 1


def test_kg_correct_bypass_is_catalyst_side(spark):
    """Passthrough rows (unknown endpoint / predicate already connects the
    pair) must not cross the Arrow boundary: the plan contains a union whose
    passthrough leg has no MapInPandas."""
    from relation_extraction_spark.operators.kg import kg_correct, kg_vertices

    gold = gold_triples_df(spark, 100).withColumn("text", F.lit("文本"))
    p = plan_of(kg_correct(gold, kg_edges(gold), kg_vertices(gold)))
    assert p.count("MapInPandas") == 1, p
    assert "Union" in p, p


def test_ivf_assignment_has_no_exchange(spark):
    """The inverted-file assignment is a pure projection over the inlined
    codebook — shuffling the (16×-fanned) vector table for a window argmax
    would be the exact cost IVF exists to avoid. Only the final per-query
    top-k windows may exchange (and they operate on candidates, not the
    vector table)."""
    import math

    from relation_extraction_spark.operators.similarity import ivf_topk

    rows = [(i, [math.sin(i * 0.7 + d) for d in range(8)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector"))
    p = plan_of(ivf_topk(emb, q, k=5, n_centroids=4, n_probe=2))
    # exactly ONE exchange of real data: the final top-k window partitioning
    # by query_id over candidate rows (broadcasts don't count)
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_curation_map_ops_have_no_exchange(spark):
    """Repetition scoring and PII redaction are projections — any shuffle
    here is a planner regression (they run over the full corpus)."""
    from relation_extraction_spark.operators.curation import pii_redact, repetition_scores

    docs = documents_df(spark, 50).selectExpr("url as doc_id", "text")
    assert "Exchange" not in plan_of(repetition_scores(docs), "formatted")
    assert "Exchange" not in plan_of(pii_redact(docs), "formatted")


def test_paragraph_dedup_combinable_no_window(spark):
    """Global first-seen dedup must use a map-side-combinable min groupBy,
    never a row_number window: the window puts every copy of the hottest
    boilerplate paragraph into ONE unsplittable task at web scale."""
    from relation_extraction_spark.operators.curation import paragraph_dedup

    docs = documents_df(spark, 50).selectExpr("url as doc_id", "text")
    p = plan_of(paragraph_dedup(docs))
    assert "Window" not in p, p
    assert "partial_min" in p, p  # the winner agg map-side combines
    assert p.count("Exchange hashpartitioning") <= 4, p


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must reach executors as a broadcast — a
    shuffle join here would hash-exchange the full corpus gram explosion."""
    from relation_extraction_spark.operators.curation import decontaminate

    docs = documents_df(spark, 50).selectExpr("url as doc_id", "text")
    bench = docs.limit(2).select("text")
    p = plan_of(decontaminate(docs, bench, n=8))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p


def test_scan_prunes_columns(spark, tmp_path):
    """Parquet scan for a 2-column projection reads exactly those columns."""
    path = str(tmp_path / "docs")
    documents_df(spark, 50).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).select("url", "lang").where(F.col("lang") == "zh")
    p = plan_of(df, "formatted")
    assert "ReadSchema" in p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "url" in read_schema and "lang" in read_schema
    assert "html" not in read_schema and "text" not in read_schema
    assert "PushedFilters: [" in p and "IsNotNull(lang)" in p, p


def test_decode_media_single_arrow_stage(spark):
    """Media decode is one shuffle-free Arrow stage — an Exchange here would
    shuffle raw binary payloads, the most expensive bytes in the table."""
    from relation_extraction_spark.operators.multimodal import (
        decode_media,
        synthetic_media_df,
    )

    p = plan_of(decode_media(synthetic_media_df(spark, 12)))
    assert "Exchange" not in p, p
    assert p.count("MapInPandas") == 1, p


def test_tokenize_df_single_arrow_stage(spark):
    """The fused ST1-ST6 tokenize stage stays one MapInPandas with no
    shuffle; the broadcast vocab must never become a join."""
    from relation_extraction_spark.operators.tokenize import tokenize_df

    docs = documents_df(spark, 30).select("url", "text")
    p = plan_of(tokenize_df(docs, vocab={"a": 1}))
    assert "Exchange" not in p, p
    assert p.count("MapInPandas") == 1, p
    assert "Join" not in p, p


def test_extract_links_no_exchange_and_pruned_scan(spark, tmp_path):
    """The web-graph edge extractor is map-only (decode → regex → explode →
    resolve): zero Exchanges even with canonicalize=True, and the parquet
    scan reads ONLY (url, html) — text/lang/other columns pruned."""
    from relation_extraction_spark.operators.web import extract_links

    p = str(tmp_path / "docs")
    rows = [("https://a.com/p", b'<a href="/x">y</a>', "txt", "en", 1)]
    spark.createDataFrame(
        rows, "url string, html binary, text string, lang string, n int"
    ).write.mode("overwrite").parquet(p)
    out = extract_links(spark.read.parquet(p), canonicalize=True)
    qe = out._jdf.queryExecution()
    assert qe.executedPlan().toString().count("Exchange") == 0
    import re

    m = re.search(r"ReadSchema: ([^\n]*)", qe.toString())
    assert m and m.group(1) == "struct<url:string,html:binary>"


def test_merge_delta_broadcast_split_two_disjoint_folds(spark):
    """The delta merge splits BOTH inputs by broadcast semi/anti joins on
    the touched keys, then folds each disjoint slice once: the plan has
    exactly 2 full-outer joins (one per slice), the touched-key splits are
    broadcast (4 BroadcastHashJoin: semi+anti per side), and exactly one
    Window (adjudication, touched slice only)."""
    from relation_extraction_spark.operators.kg_delta import merge_delta

    schema = ("subject string, predicate string, object string, "
              "n_refs bigint, n_domains bigint, first_seen bigint, "
              "last_seen bigint")
    base = spark.createDataFrame(
        [("a", "国籍", "x", 1, 1, 1, 1)], schema)
    delta = spark.createDataFrame(
        [("a", "国籍", "y", 1, 1, 2, 2)], schema)
    p = plan_of(merge_delta(base, delta))
    assert p.count("FullOuter") == 2, p
    assert p.count("BroadcastHashJoin") == 4, p
    assert p.count("Window") == 1, p


def test_gopher_flags_no_exchange(spark):
    """The full Gopher rule set is one scan+project — any shuffle is a
    planner regression (it runs over the complete corpus)."""
    from relation_extraction_spark.operators.curation import gopher_flags

    docs = documents_df(spark, 50).selectExpr("url as doc_id", "text")
    assert "Exchange" not in plan_of(gopher_flags(docs), "formatted")


def test_canonical_dedup_combinable_no_window(spark):
    """The canonical-target survivor must be a map-side-combinable
    min(struct) groupBy, never a row_number window: a site-wide
    boilerplate canonical would put every alternate into ONE task."""
    from relation_extraction_spark.operators.web import canonical_dedup

    docs = documents_df(spark, 30).select(
        "url", F.encode(F.lit("<html><body>x</body></html>"), "UTF-8")
        .alias("html"))
    p = plan_of(canonical_dedup(docs))
    assert "Window" not in p, p
    assert "partial_min" in p, p

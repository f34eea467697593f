"""End-to-end golden test: documents → extract → tokenize → score → decode →
formalize → combine → postprocess, P/R ≥ 0.95 vs planted gold triples
(SURVEY.md §5.3; the sandbox stand-in for the DuIE dev harness,
reference main.py:101-110,226-271)."""

import pyspark.sql.functions as F
import pytest

from relation_extraction_spark.operators.extract_triples import (
    decode_document,
    extract_text_bytes,
    extract_text_df,
    extract_triples,
)
from relation_extraction_spark.operators.scorer import SurrogateScorer
from relation_extraction_spark.synthetic import documents_df, gen_row, gold_triples_df

N_DOCS = 300


def _key(t):
    return (
        t["subject_type"], t["subject"], t["predicate"],
        tuple(sorted(t["object_type"].items())), tuple(sorted(t["object"].items())),
    )


def test_kernel_e2e_parity():
    """Driver-side check of the fused kernel against hand-specified gold."""
    scorer = SurrogateScorer()
    correct = pred_n = true_n = 0
    for i in range(N_DOCS):
        r = gen_row(i)
        if r["lang"] != "zh":
            continue
        pred = decode_document(r["text"], scorer)
        gold_keys = {_key(g) for g in r["gold"]}
        pred_keys = {_key(p) for p in pred}
        correct += len(gold_keys & pred_keys)
        pred_n += len(pred_keys)
        true_n += len(gold_keys)
    precision = correct / max(pred_n, 1)
    recall = correct / max(true_n, 1)
    assert precision >= 0.95, (precision, recall)
    assert recall >= 0.95, (precision, recall)


def test_extract_text_byte_identity():
    for i in range(50):
        r = gen_row(i)
        assert extract_text_bytes(r["html"]) == r["text"]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = documents_df(spark, N_DOCS)
    gold = gold_triples_df(spark, N_DOCS)
    return docs, gold


def test_spark_e2e_parity(spark, corpus):
    docs, gold = corpus
    # force the extraction path: blank the text column, recover it from html
    blanked = docs.withColumn("text", F.lit(None).cast("string"))
    restored = extract_text_df(blanked)
    triples = extract_triples(restored).cache()

    # J2-style exact-match scoring join (reference main.py:101-110)
    def norm(df):
        return df.select(
            "url", "subject", "predicate",
            F.concat_ws("|", F.sort_array(F.map_keys("object"))).alias("ok"),
            F.concat_ws("|", F.sort_array(F.transform(
                F.map_entries("object"), lambda e: F.concat_ws("=", e.key, e.value)))).alias("ov"),
        )

    p, g = norm(triples), norm(gold)
    correct = p.join(g, on=list(p.columns), how="inner").count()
    pred_n = p.count()
    true_n = g.count()
    precision, recall = correct / max(pred_n, 1), correct / max(true_n, 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall, pred_n, true_n)


def test_partition_invariance(spark, corpus):
    """Decode determinism under repartition (SURVEY.md §4 item 4) — the
    correctness precondition for the two-cluster-size scaling check."""
    docs, _ = corpus
    out2 = extract_triples(docs.repartition(2)).orderBy(
        "url", "subject", "predicate").select("url", "subject", "predicate").collect()
    out16 = extract_triples(docs.repartition(16)).orderBy(
        "url", "subject", "predicate").select("url", "subject", "predicate").collect()
    assert out2 == out16


def test_truncation_beyond_max_tokens():
    """Entities planted past the 203-token truncation point are skipped
    gracefully (no crash, no partial spans); entities before it survive."""
    from relation_extraction_spark.operators.extract_triples import decode_document
    from relation_extraction_spark.operators.scorer import SurrogateScorer

    filler = "这是一些没有关系的填充文字。" * 40  # pushes past MAX_TOKENS
    early = "金曲7是李明9演唱的歌曲。"
    late_doc = filler + early
    early_doc = early + filler
    sc = SurrogateScorer()
    assert any(s["predicate"] == "歌手" for s in decode_document(early_doc, sc))
    assert decode_document(late_doc, sc) == []  # truncated away, no error


def test_populated_text_skips_extraction(spark):
    """input_hint: extraction must be skipped when text is already populated
    (the html column is not even touched — column pruning)."""
    from relation_extraction_spark.operators.extract_triples import extract_text_df

    docs = spark.createDataFrame(
        [("u1", None, b"<p>FROM-HTML</p>", "already here", "zh")],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    out = extract_text_df(docs).select("text").collect()
    assert out[0]["text"] == "already here"

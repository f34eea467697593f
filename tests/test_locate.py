"""J1 entity-occurrence locate tests."""

import pytest

from relation_extraction_spark.operators.locate import (
    all_occurrences,
    locate_doc_entities,
    locate_entities,
    occurrence_counts_sql_style,
)


def test_all_occurrences_non_overlapping():
    assert all_occurrences("aaaa", "aa") == [(0, 1), (2, 3)]
    assert all_occurrences("xyx", "q") == []
    assert all_occurrences("金曲3是金曲3", "金曲3") == [(0, 2), (4, 6)]


def test_locate_entities_df(spark):
    docs = spark.createDataFrame(
        [("u1", "spark and spark again"), ("u2", "no hits here")],
        "url string, text string")
    ents = spark.createDataFrame([("spark",)], "entity string")
    out = {(r["url"]): r for r in locate_entities(docs, ents).collect()}
    assert out["u1"]["n_occ"] == 2
    assert [(s["s"], s["e"]) for s in out["u1"]["spans"]] == [(0, 4), (10, 14)]
    assert out["u2"]["n_occ"] == 0


def test_locate_doc_entities_per_doc_lists(spark):
    """Each doc scans only its OWN entities (reference main.py:380-405):
    u1's text contains 'table' but u1's list doesn't ask for it, so no row."""
    docs = spark.createDataFrame(
        [("u1", "spark table spark"), ("u2", "spark table"), ("u3", "empty")],
        "url string, text string")
    ents = spark.createDataFrame(
        [("u1", "spark"), ("u2", "table"), ("u2", "ghost"), ("u2", "table")],
        "url string, entity string")
    out = {(r["url"], r["entity"]): r for r in
           locate_doc_entities(docs, ents).collect()}
    assert set(out) == {("u1", "spark"), ("u2", "table"), ("u2", "ghost")}
    assert out[("u1", "spark")]["n_occ"] == 2
    assert [(s["s"], s["e"]) for s in out[("u1", "spark")]["spans"]] == [(0, 4), (12, 16)]
    assert out[("u2", "table")]["n_occ"] == 1
    assert out[("u2", "ghost")]["n_occ"] == 0


def test_locate_entities_vocab_guard(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([("u1", "x")], "url string, text string")
    ents = spark.range(50).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("entity"))
    with pytest.raises(ValueError, match="locate_doc_entities"):
        locate_entities(docs, ents, max_entities=10)


def test_counts_agree_with_span_variant(spark):
    docs = spark.createDataFrame(
        [(1, "a table on a table by the table"), (2, "tableau")],
        "doc_id int, text string")
    ents = spark.createDataFrame([("table",)], "entity string")
    spans = {r["url"]: r["n_occ"] for r in
             locate_entities(docs, ents, id_col="doc_id").collect()}
    counts = {r["doc_id"]: r["n_occ"] for r in
              occurrence_counts_sql_style(docs, ents).collect()}
    assert spans == {"1": 3, "2": 1} and counts == {1: 3, 2: 1}

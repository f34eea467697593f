"""Facade smoke test: the full user workflow through KGEngine."""

import pyspark.sql.functions as F

from relation_extraction_spark.api import KGEngine
from relation_extraction_spark.synthetic import documents_df, gold_triples_df


def test_engine_workflow(spark, tmp_path):
    eng = KGEngine(spark)
    docs = documents_df(spark, 80)
    gold = gold_triples_df(spark, 80)

    prep = eng.prepare_corpus(docs)
    assert "tokens" in prep.columns and prep.count() == 80

    triples = eng.extract(docs)
    m = eng.score(triples, gold)
    assert m["f1"] >= 0.95

    edges, vertices = eng.build_kg(triples)
    assert edges.count() > 0 and vertices.count() > 0

    canon = eng.canonicalize(edges)
    assert canon.count() > 0

    decomposed = eng.decompose_gold(gold)
    recombined = eng.recombine(decomposed, docs)
    m2 = eng.score(recombined, gold)
    assert m2["recall"] >= 0.95

    out = eng.run_pipeline(docs, str(tmp_path / "cat"))
    assert out["canonical_edges"].count() > 0


def test_extract_one_matches_corpus_path(spark):
    """reference test_a_line parity surface (main.py:320-337): one string →
    triples, identical to what the distributed extract emits for the same
    text."""
    from relation_extraction_spark.api import KGEngine
    from relation_extraction_spark.synthetic import gen_row

    eng = KGEngine(spark)
    r = gen_row(1)  # a zh row with gold triples
    got = eng.extract_one(r["text"])
    assert got, "single-string extraction produced no triples"
    key = lambda t: (t["subject_type"], t["subject"], t["predicate"],  # noqa: E731
                     tuple(sorted(t["object"].items())))
    # corpus path on a one-row DataFrame → same triple set
    docs = spark.createDataFrame(
        [(r["url"], r["text"], r["lang"])], "url string, text string, lang string")
    corpus = [
        {"subject_type": x["subject_type"], "subject": x["subject"],
         "predicate": x["predicate"], "object": dict(x["object"])}
        for x in eng.extract(docs.withColumn("html", F.lit(None).cast("binary"))
                             .withColumn("warc_ts", F.current_timestamp())).collect()
    ]
    assert sorted(map(key, got)) == sorted(map(key, corpus))
    # and the planted gold is recovered
    assert {key(g) for g in r["gold"]} <= {key(t) for t in got}

"""Facade smoke test: the full user workflow through KGEngine."""

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

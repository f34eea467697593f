"""Entry point C end-to-end (SURVEY.md §3.3): k model outputs → union-distinct
→ vote + KG filter → combine with main ensemble → final triples, scored vs
gold. Noisy models are deterministic scorer wrappers (drop/garble by hash)."""

import pyspark.sql.functions as F
import pytest

from relation_extraction_spark.operators.eval import micro_prf
from relation_extraction_spark.operators.extract_triples import extract_triples
from relation_extraction_spark.operators.kg import kg_edges
from relation_extraction_spark.operators.scorer import DroppingScorer, SurrogateScorer
from relation_extraction_spark.operators.vote import combine_results, vote_and_kg_filter
from relation_extraction_spark.synthetic import documents_df, gold_triples_df

N = 150


@pytest.fixture(scope="module")
def setup(spark):
    docs = documents_df(spark, N)
    gold = gold_triples_df(spark, N)
    # reference KG built from "training" gold (disjoint doc range)
    train_gold = gold_triples_df(spark, 400).join(
        gold.select("url").dropDuplicates(), "url", "left_anti")
    edges = kg_edges(train_gold)
    return docs, gold, edges


def test_vote_chain_recovers_gold(spark, setup):
    docs, gold, edges = setup
    outputs = []
    for m in range(5):
        triples = extract_triples(docs, scorer=DroppingScorer(seed=m))
        outputs.append(triples.withColumn("model_id", F.lit(m)))
    all_out = outputs[0]
    for o in outputs[1:]:
        all_out = all_out.unionByName(o)
    kept, rejected = vote_and_kg_filter(all_out, edges, min_votes=3)

    # a clean main-ensemble output unioned in (R7)
    main = extract_triples(docs, scorer=SurrogateScorer())
    final = combine_results(main, kept)

    m_single = micro_prf(outputs[0].drop("model_id"), gold)
    m_final = micro_prf(final, gold)
    # voting + KG filter + main union must beat a single noisy model's recall
    assert m_final["recall"] >= m_single["recall"]
    assert m_final["recall"] >= 0.95 and m_final["precision"] >= 0.95, (m_single, m_final)


def test_vote_rejects_minority_noise(spark, setup):
    docs, gold, edges = setup
    # inject a fabricated triple into only one model's output
    fake = spark.createDataFrame(
        [("https://site0.example/page/0", "人物", "幻影", "国籍",
          {"@value": "国家"}, {"@value": "无处"}, 0)],
        "url string, subject_type string, subject string, predicate string, "
        "object_type map<string,string>, object map<string,string>, model_id int")
    outputs = [extract_triples(docs).withColumn("model_id", F.lit(m)) for m in range(3)]
    all_out = outputs[0].unionByName(fake)
    for o in outputs[1:]:
        all_out = all_out.unionByName(o)
    kept, rejected = vote_and_kg_filter(all_out, edges, min_votes=3)
    assert kept.where(F.col("subject") == "幻影").count() == 0
    assert rejected.where(F.col("subject") == "幻影").count() == 1

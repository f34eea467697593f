"""LIC2019-style flat-schema corpus end-to-end (reference data/lic_2019.py:
44-77, 99-125): 3 flat predicates with their own id space, @value-only
objects, run through the facade's extract → score — proving the
predicate-gated R1/R2 bypass (no recomposition, no helper predicates)."""

import re

import pytest

from relation_extraction_spark.api import KGEngine
from relation_extraction_spark.operators.scorer import RuleScorer
from relation_extraction_spark.schema import COMBINE_PREDICATES, flat_schema

FLAT = flat_schema([
    ("作者", "图书作品", "人物"),
    ("歌手", "歌曲", "人物"),
    ("身高", "人物", "Number"),
])

_RULES = [
    (re.compile(r"《(书\d+)》的作者是(王五\d+)"), [(1, "图书作品", "作者", 2)]),
    (re.compile(r"(歌\d+)是(王五\d+)演唱的"), [(1, "歌曲", "歌手", 2)]),
    (re.compile(r"(王五\d+)的身高是(\d+cm)"), [(1, "人物", "身高", 2)]),
]
_SBJ2ID = {"图书作品": 0, "歌曲": 1, "人物": 2}


def FlatScorer():
    return RuleScorer(_RULES, _SBJ2ID, FLAT.pred2id)


def _corpus(spark, n):
    rows = []
    gold = []
    for i in range(n):
        k = i % 17
        text = (f"《书{k}》的作者是王五{k}。王五{k}的身高是1{70 + k % 20}cm。"
                f"歌{k}是王五{k}演唱的。")
        url = f"u{i}"
        rows.append((url, text, "zh"))
        gold += [
            (url, "图书作品", f"书{k}", "作者", f"王五{k}"),
            (url, "人物", f"王五{k}", "身高", f"1{70 + k % 20}cm"),
            (url, "歌曲", f"歌{k}", "歌手", f"王五{k}"),
        ]
    docs = spark.createDataFrame(rows, "url string, text string, lang string")
    gold_df = spark.createDataFrame(
        gold, "url string, subject_type string, subject string, predicate string, object string")
    return docs, gold_df


@pytest.fixture(scope="module")
def flat_run(spark):
    docs, gold = _corpus(spark, 60)
    engine = KGEngine(spark, scorer=FlatScorer(), schema=FLAT)
    pred = engine.extract(docs.withColumn("html", docs.text.cast("binary")))
    return pred.cache(), gold


def test_flat_schema_exact_parity(spark, flat_run):
    from pyspark.sql import functions as F

    pred, gold = flat_run
    p = pred.select("url", "subject_type", "subject", "predicate",
                    F.col("object")["@value"].alias("object")).dropDuplicates()
    correct = p.join(gold, p.columns).count()
    assert correct == p.count() == gold.count()


def test_flat_schema_bypasses_rewrites(spark, flat_run):
    pred, _ = flat_run
    preds = {r["predicate"] for r in pred.select("predicate").dropDuplicates().collect()}
    assert preds == {"作者", "歌手", "身高"}
    assert not preds & COMBINE_PREDICATES          # no recomposition targets
    # @value-only objects: no complex slots ever appear
    assert all(set(r["object"].keys()) == {"@value"}
               for r in pred.select("object").collect())

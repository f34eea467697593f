"""KG build/correction, voting, eval and DataFrame rewrite tests
(SURVEY.md §2 A2/A7/A8, R6/R8/R9, J2/J4)."""

import pyspark.sql.functions as F
import pytest

from relation_extraction_spark.operators.eval import diff_triples, micro_prf
from relation_extraction_spark.operators.kg import (
    fix_spo,
    kg_correct,
    kg_edges,
    kg_vertices,
    self_check,
    with_in_kg,
)
from relation_extraction_spark.operators.rewrite_df import combine_spos_df, expand_spo_df
from relation_extraction_spark.operators.vote import combine_results, vote_and_kg_filter
from relation_extraction_spark.schema import TRIPLE_SCHEMA


def make_triples(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows], TRIPLE_SCHEMA
    )


@pytest.fixture(scope="module")
def gold(spark):
    return make_triples(spark, [
        ("u1", "人物", "张伟", "妻子", {"@value": "人物"}, {"@value": "王芳"}),
        ("u1", "人物", "李强", "父亲", {"@value": "人物"}, {"@value": "张伟"}),
        ("u2", "歌曲", "歌A", "歌手", {"@value": "人物"}, {"@value": "刘洋"}),
        ("u2", "影视作品", "片B", "主演", {"@value": "人物"}, {"@value": "刘洋"}),
    ])


def test_kg_edges_distinct(spark, gold):
    e = kg_edges(gold.unionByName(gold))
    assert e.count() == 4


def test_kg_edges_split_names_flag(spark):
    """ST10 (reference utils/kg.py:497-525, dormant): OFF by default —
    kg_edges output unchanged; ON — each split part of a work-title
    subject or 、-joined person object gains a copy of the original edge
    while originals stay (copy_node keeps the source node)."""
    from relation_extraction_spark.operators.kg import split_entity_names

    t = make_triples(spark, [
        ("u1", "图书作品", "《甲》《乙》", "作者",
         {"@value": "人物"}, {"@value": "张三、李四"}),
        ("u2", "人物", "王五", "国籍", {"@value": "国家"}, {"@value": "中国"}),
    ])
    off = {(r["subject"], r["object"]) for r in kg_edges(t).collect()}
    assert off == {("《甲》《乙》", "张三、李四"), ("王五", "中国")}
    on = {(r["subject"], r["object"])
          for r in kg_edges(t, split_names=True).collect()}
    assert on == {
        ("《甲》《乙》", "张三、李四"),                    # original kept
        ("《甲", "张三、李四"), ("乙》", "张三、李四"),     # subject parts
        ("《甲》《乙》", "张三"), ("《甲》《乙》", "李四"),  # object parts
        ("王五", "中国"),                   # 人物 single-part copy = original
    }
    # the standalone operator: fullwidth comma gates org/person splits
    ents = spark.createDataFrame(
        [("阿里，腾讯", "企业"), ("某地", "地点")],
        "entity string, entity_type string")
    assert split_entity_names(ents).count() == 0


def test_kg_vertices_properties(spark, gold):
    v = {r["entity"]: r.asDict() for r in kg_vertices(gold).collect()}
    # 张伟: subject of 妻子 → male; object of 父亲 → male (consistent)
    assert v["张伟"]["gender"] == "male"
    assert v["王芳"]["gender"] == "female"
    # 刘洋: object of 歌手 and 主演 → professions counted
    assert v["刘洋"]["professions"] == {"歌手": 1, "主演": 1}
    assert v["刘洋"]["fictional"] is False


def test_kg_vertices_gender_conflict(spark):
    t = make_triples(spark, [
        ("u1", "人物", "某甲", "妻子", {"@value": "人物"}, {"@value": "某乙"}),
        ("u2", "人物", "某丙", "父亲", {"@value": "人物"}, {"@value": "某乙"}),
    ])
    v = {r["entity"]: r["gender"] for r in kg_vertices(t).collect()}
    assert v["某乙"] == "error"  # female (妻子 obj) + male (父亲 obj)


def test_with_in_kg(spark, gold):
    edges = kg_edges(gold)
    pred = make_triples(spark, [
        ("u9", "人物", "张伟", "妻子", {"@value": "人物"}, {"@value": "王芳"}),
        ("u9", "人物", "张伟", "妻子", {"@value": "人物"}, {"@value": "别人"}),
    ])
    out = {r["object"]["@value"]: r["in_kg"] for r in with_in_kg(pred, edges).collect()}
    assert out == {"王芳": True, "别人": False}


def test_vote_and_kg_filter(spark, gold):
    edges = kg_edges(gold)
    rows = []
    # triple X: in 4/5 models, not in KG → kept by votes
    for m in range(4):
        rows.append(("u5", "人物", "甲", "国籍", {"@value": "国家"}, {"@value": "中国"}, m))
    # triple Y: 1 model, in KG → kept by KG
    rows.append(("u5", "人物", "张伟", "妻子", {"@value": "人物"}, {"@value": "王芳"}, 0))
    # triple Z: 2 models, not in KG → rejected
    for m in range(2):
        rows.append(("u5", "人物", "乙", "国籍", {"@value": "国家"}, {"@value": "法国"}, m))
    from pyspark.sql import types as T

    with_model = T.StructType(TRIPLE_SCHEMA.fields + [T.StructField("model_id", T.IntegerType())])
    df = spark.createDataFrame(rows, with_model)
    kept, rejected = vote_and_kg_filter(df, edges, min_votes=3)
    kept_subjects = {r["subject"] for r in kept.collect()}
    assert kept_subjects == {"甲", "张伟"}
    assert {r["subject"] for r in rejected.collect()} == {"乙"}


def test_combine_results_union_distinct(spark, gold):
    a = gold.limit(2)
    out = combine_results(a, gold)
    assert out.count() == gold.count()


def test_micro_prf_and_diff(spark, gold):
    pred = gold.limit(3).unionByName(make_triples(spark, [
        ("u9", "人物", "假", "国籍", {"@value": "国家"}, {"@value": "错"}),
    ]))
    m = micro_prf(pred, gold)
    assert m["correct"] == 3 and m["pred"] == 4 and m["true"] == 4
    only_p, only_g = diff_triples(pred, gold)
    assert only_p.count() == 1 and only_g.count() == 1


def test_kg_correct_predicate_rewrite(spark):
    """嘉宾 predicted but KG says 主持人 → rewritten (utils/kg.py:226-233)."""
    kg = make_triples(spark, [
        ("g", "电视综艺", "节目C", "主持人", {"@value": "人物"}, {"@value": "赵敏"}),
        ("g", "人物", "赵敏", "国籍", {"@value": "国家"}, {"@value": "中国"}),
        ("g", "电视综艺", "节目C", "简称", {"@value": "Text"}, {"@value": "C"}),
    ])
    edges, vertices = kg_edges(kg), kg_vertices(kg)
    pred = make_triples(spark, [
        ("u1", "电视综艺", "节目C", "嘉宾", {"@value": "人物"}, {"@value": "赵敏"}),
    ]).withColumn("text", F.lit("节目C由赵敏主持"))
    out = kg_correct(pred, edges, vertices).collect()
    assert len(out) == 1 and out[0]["predicate"] == "主持人"


def test_kg_correct_known_edge_untouched(spark):
    kg = make_triples(spark, [
        ("g", "电视综艺", "节目C", "嘉宾", {"@value": "人物"}, {"@value": "赵敏"}),
    ])
    pred = make_triples(spark, [
        ("u1", "电视综艺", "节目C", "嘉宾", {"@value": "人物"}, {"@value": "赵敏"}),
    ]).withColumn("text", F.lit("x"))
    out = kg_correct(pred, kg_edges(kg), kg_vertices(kg)).collect()
    assert out[0]["predicate"] == "嘉宾"


def test_kg_correct_unique_object(spark):
    """J5: functional predicate, KG object present in text → object replaced."""
    kg = make_triples(spark, [
        ("g", "人物", "周杰", "父亲", {"@value": "人物"}, {"@value": "周父"}),
        ("g", "人物", "错名", "国籍", {"@value": "国家"}, {"@value": "中国"}),
    ])
    pred = make_triples(spark, [
        ("u1", "人物", "周杰", "父亲", {"@value": "人物"}, {"@value": "错名"}),
    ]).withColumn("text", F.lit("周杰的父亲周父是商人"))
    out = kg_correct(pred, kg_edges(kg), kg_vertices(kg)).collect()
    assert out[0]["object"]["@value"] == "周父"


def test_fix_spo_alias_containment(spark):
    """J4: unknown person object contains a known KG name → repaired."""
    kg = make_triples(spark, [
        ("g", "图书作品", "书X", "作者", {"@value": "人物"}, {"@value": "吴刚"}),
    ])
    pred = make_triples(spark, [
        ("u1", "图书作品", "书X", "作者", {"@value": "人物"}, {"@value": "大作家吴刚先生"}),
        ("u1", "图书作品", "书X", "简称", {"@value": "Text"}, {"@value": "X"}),
    ])
    out = fix_spo(pred, kg_edges(kg))
    fixed = {r["object"]["@value"] for r in out.where(F.col("predicate") == "作者").collect()}
    assert "吴刚" in fixed
    assert out.where(F.col("predicate") == "简称").count() == 1


def test_self_check_parent_conflict(spark):
    """R9: both 父亲 and 母亲 edges to a male entity → 母亲 deleted."""
    built = make_triples(spark, [
        ("u1", "人物", "小孩", "父亲", {"@value": "人物"}, {"@value": "大人"}),
        ("u1", "人物", "小孩", "母亲", {"@value": "人物"}, {"@value": "大人"}),
    ])
    std = make_triples(spark, [
        ("g", "人物", "大人", "妻子", {"@value": "人物"}, {"@value": "女士"}),
    ])
    out = self_check(kg_edges(built), kg_vertices(std)).collect()
    preds = {r["predicate"] for r in out}
    assert preds == {"父亲"}


def test_self_check_surname_heuristic(spark):
    built = make_triples(spark, [
        ("u1", "人物", "陈小", "父亲", {"@value": "人物"}, {"@value": "陈大"}),
        ("u1", "人物", "陈小", "母亲", {"@value": "人物"}, {"@value": "陈大"}),
    ])
    std = make_triples(spark, [("g", "人物", "无关", "国籍", {"@value": "国家"}, {"@value": "中国"})])
    out = self_check(kg_edges(built), kg_vertices(std)).collect()
    assert {r["predicate"] for r in out} == {"父亲"}  # same surname → 母亲 deleted


def test_expand_spo_df_matches_kernel(spark):
    from relation_extraction_spark.operators.rewrite import expand_spo as expand_kernel

    complex_rows = [
        ("u1", "娱乐人物", "甲", "配音", {"inWork": "影视作品", "@value": "人物"},
         {"inWork": "作品X", "@value": "角色Y"}),
        ("u1", "娱乐人物", "乙", "获奖",
         {"inWork": "作品", "@value": "奖项", "onDate": "Date"},
         {"inWork": "作品Z", "@value": "大奖W", "onDate": "2010年"}),
        ("u2", "人物", "丙", "国籍", {"@value": "国家"}, {"@value": "中国"}),
    ]
    df = make_triples(spark, complex_rows)
    got = sorted(
        (r["subject"], r["predicate"], tuple(sorted(r["object"].items())))
        for r in expand_spo_df(df).collect()
    )
    want = []
    for u, st, s, p, ot, o in complex_rows:
        for e in expand_kernel({"subject_type": st, "subject": s, "predicate": p,
                                "object_type": ot, "object": o}):
            want.append((e["subject"], e["predicate"], tuple(sorted(e["object"].items()))))
    assert got == sorted(want)


def test_combine_spos_df_roundtrip(spark):
    docs = spark.createDataFrame(
        [("u1", "乙凭借《作品Z》荣获第十二届大奖W。")], "url string, text string")
    complex_row = ("u1", "娱乐人物", "乙", "获奖",
                   {"inWork": "作品", "@value": "奖项", "onDate": "Date"},
                   {"inWork": "作品Z", "@value": "大奖W", "onDate": "2010年"})
    simple = expand_spo_df(make_triples(spark, [complex_row]))
    out = combine_spos_df(simple, docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["predicate"] == "获奖"
    assert r["object"]["inWork"] == "作品Z"
    assert r["object"]["onDate"] == "2010年"
    assert r["object"]["period"] == "十二"  # re-derived from text by add_period


def test_fix_spo_replaces_original(spark):
    """The repaired triple REPLACES its original (utils/kg.py:328-330) —
    the unfixed long-form object must be gone from the output."""
    kg = make_triples(spark, [
        ("g", "图书作品", "书X", "作者", {"@value": "人物"}, {"@value": "吴刚"}),
    ])
    pred = make_triples(spark, [
        ("u1", "图书作品", "书X", "作者", {"@value": "人物"}, {"@value": "大作家吴刚先生"}),
    ])
    out = fix_spo(pred, kg_edges(kg)).collect()
    assert len(out) == 1
    assert out[0]["object"]["@value"] == "吴刚"

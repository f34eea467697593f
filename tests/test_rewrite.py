"""R1/R2/R3/R4 rewrite-rule unit + property tests (SURVEY.md §5.1-5.2).

Round-trip property mirrors the reference's own fidelity check
combine_spos(expand_spo(gold)) == gold (reference data/lic_2020.py:781-797)."""

from relation_extraction_spark.operators.rewrite import (
    add_period,
    clean_spos,
    combine_spos,
    expand_spo,
    home_relation,
    postprocess_1,
    simplify_schema,
)
from relation_extraction_spark.synthetic import gen_row


def spo(st, s, p, ot, o):
    return {"subject_type": st, "subject": s, "predicate": p, "object_type": ot, "object": o}


DUB = spo("娱乐人物", "甲", "配音", {"inWork": "影视作品", "@value": "人物"},
          {"inWork": "作品X", "@value": "角色Y"})
AWARD = spo("娱乐人物", "乙", "获奖",
            {"inWork": "作品", "@value": "奖项", "onDate": "Date"},
            {"inWork": "作品Z", "@value": "大奖W", "onDate": "2010年"})
PORTRAY = spo("娱乐人物", "丙", "饰演", {"inWork": "影视作品", "@value": "人物"},
              {"inWork": "作品V", "@value": "角色U"})
RELEASE = spo("影视作品", "作品Q", "上映时间", {"inArea": "地点", "@value": "Date"},
              {"inArea": "北美", "@value": "2015年1月"})
BOXOFFICE = spo("影视作品", "作品R", "票房", {"inArea": "地点", "@value": "Number"},
                {"inArea": "中国", "@value": "3亿"})
SIMPLE = spo("人物", "丁", "国籍", {"@value": "国家"}, {"@value": "中国"})


def test_expand_dub():
    out = expand_spo(DUB)
    assert len(out) == 2
    assert out[0]["predicate"] == "配音" and out[0]["object"] == {"@value": "角色Y"}
    assert out[1]["predicate"] == "角色" and out[1]["subject"] == "作品X"


def test_expand_award_drops_period():
    spo_p = dict(AWARD)
    spo_p["object"] = {**AWARD["object"], "period": "十二"}
    spo_p["object_type"] = {**AWARD["object_type"], "period": "Number"}
    out = expand_spo(spo_p)
    preds = [s["predicate"] for s in out]
    assert preds == ["获奖", "作品", "作品获奖", "奖项时间"]
    assert all("period" not in s["object"] for s in out)


def test_expand_simple_passthrough():
    assert expand_spo(SIMPLE) == [SIMPLE]


def test_roundtrip_property():
    """combine ∘ expand = id for every complex shape (without period)."""
    for gold in [DUB, AWARD, PORTRAY, RELEASE, BOXOFFICE, SIMPLE]:
        expanded = []
        for g in [gold]:
            expanded.extend(expand_spo(g))
        combined = combine_spos(expanded)
        assert combined == [gold], (gold["predicate"], combined)


def test_roundtrip_mixed_document():
    golds = [SIMPLE, DUB, RELEASE, AWARD, PORTRAY, BOXOFFICE]
    expanded = []
    for g in golds:
        expanded.extend(expand_spo(g))
    combined = combine_spos(expanded)
    assert sorted(combined, key=str) == sorted(golds, key=str)


def test_unmatched_portray_dropped():
    # 饰演 without a matching intermediate vanishes (data/lic_2020.py:540-556)
    lone = spo("娱乐人物", "丙", "饰演", {"@value": "人物"}, {"@value": "角色U"})
    assert combine_spos([lone]) == []


def test_unmatched_dub_kept_simple():
    lone = spo("娱乐人物", "甲", "配音", {"@value": "人物"}, {"@value": "角色Y"})
    assert combine_spos([lone]) == [lone]


def test_dub_multi_work_fanout():
    # one 配音 + two 角色 matches in different works → one complex per work
    d = spo("娱乐人物", "甲", "配音", {"@value": "人物"}, {"@value": "角色Y"})
    r1 = spo("影视作品", "作品A", "角色", {"@value": "人物"}, {"@value": "角色Y"})
    r2 = spo("影视作品", "作品B", "角色", {"@value": "人物"}, {"@value": "角色Y"})
    out = combine_spos([d, r1, r2])
    works = sorted(s["object"]["inWork"] for s in out)
    assert works == ["作品A", "作品B"]


def test_add_period():
    text = "乙凭借《作品Z》荣获第十二届大奖W。"
    s = spo("娱乐人物", "乙", "获奖", {"@value": "奖项"}, {"@value": "大奖W"})
    out = add_period(text, s)
    assert out["object"]["period"] == "十二"
    assert out["object_type"]["period"] == "Number"


def test_add_period_shou():
    text = "乙获得首届大奖W。"
    s = spo("娱乐人物", "乙", "获奖", {"@value": "奖项"}, {"@value": "大奖W"})
    out = add_period(text, s)
    assert out["object"]["period"] == "首"


def test_add_period_skips_spaces():
    text = "乙荣获第三届 大奖W。"
    s = spo("娱乐人物", "乙", "获奖", {"@value": "奖项"}, {"@value": "大奖W"})
    assert add_period(text, s)["object"]["period"] == "三"


def test_home_relation_spouse_derivation():
    spos = [
        spo("人物", "子", "父亲", {"@value": "人物"}, {"@value": "爸"}),
        spo("人物", "子", "母亲", {"@value": "人物"}, {"@value": "妈"}),
    ]
    out = home_relation(spos)
    assert spo("人物", "妈", "丈夫", {"@value": "人物"}, {"@value": "爸"}) in out
    assert spo("人物", "爸", "妻子", {"@value": "人物"}, {"@value": "妈"}) in out


def test_home_relation_wife_inverse():
    spos = [spo("人物", "夫", "妻子", {"@value": "人物"}, {"@value": "妇"})]
    out = home_relation(spos)
    assert spo("人物", "妇", "丈夫", {"@value": "人物"}, {"@value": "夫"}) in out


def test_postprocess_dedup_order():
    a = SIMPLE
    out = postprocess_1("任意文字", [a, dict(a)])
    assert out == [a]


def test_simplify_schema():
    h = spo("人物", "夫", "丈夫", {"@value": "人物"}, {"@value": "妇"})
    out = simplify_schema([h])
    assert out == [spo("人物", "妇", "妻子", {"@value": "人物"}, {"@value": "夫"})]


def test_clean_drops_empty_and_self_loop():
    bad1 = spo("人物", "", "国籍", {"@value": "国家"}, {"@value": "中国"})
    bad2 = spo("图书作品", "同名", "作者", {"@value": "人物"}, {"@value": "同名"})
    ok_self = spo("影视作品", "同名", "改编自", {"@value": "作品"}, {"@value": "同名"})
    out = clean_spos([bad1, bad2, ok_self, SIMPLE])
    assert bad1 not in out and bad2 not in out
    assert any(s["subject"] == "同名" and s["predicate"] == "改编自" for s in out)
    assert any(s["predicate"] == "国籍" for s in out)


def test_clean_reattaches_raw_types():
    s = spo("错误类型", "某机构", "成立日期", {"@value": "错"}, {"@value": "2001年"})
    out = clean_spos([s])
    assert out[0]["subject_type"] == "机构"
    assert out[0]["object_type"] == {"@value": "Date"}


def test_synthetic_gold_roundtrip():
    """Property on the synthetic corpus: expand → combine recovers the gold
    complex triples for every generated document (mirrors the reference's
    full-train-set check, data/lic_2020.py:781-797)."""
    for i in range(0, 400):
        r = gen_row(i)
        if not r["gold"]:
            continue
        golds = list(r["gold"])
        expanded = []
        for g in golds:
            expanded.extend(expand_spo(g))
        combined = combine_spos(expanded)
        for g in golds:
            if g["predicate"] == "获奖":
                # period is dropped by expand and re-derived from text later
                g = {**g, "object": {k: v for k, v in g["object"].items() if k != "period"},
                     "object_type": {k: v for k, v in g["object_type"].items() if k != "period"}}
            assert g in combined, (i, g, combined)

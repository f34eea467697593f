"""Differential test: kg_correct (joins + Arrow kernel) vs an independent
in-memory simulator of the reference's check_spo algorithm
(utils/kg.py:224-280) on randomized fixtures. Catches plumbing bugs in the
join/enrichment layer that unit fixtures may miss."""

import random

import pytest

from relation_extraction_spark.operators.kg import kg_correct, kg_edges, kg_vertices
from relation_extraction_spark.schema import (
    CONFLICT_GROUPS,
    MY_SCHEMA_DICT,
    PROFESSION_CONFLICTS,
    TRIPLE_SCHEMA,
    UNIQUE_PREDICATES,
)

_PROF_OBJ = ("作者", "编剧", "歌手", "制片人", "作词", "导演", "作曲", "主演", "主持人")


def simulate_check_spo(text, spos, kg_triples):
    """Dict-based mirror of the reference algorithm with our documented
    deterministic divergence: KG neighbor lists iterate lexicographically."""
    entities = set()
    pair_preds = {}
    adjacency = {}
    professions = {}
    has_in_wife = set()
    for t in kg_triples:
        s, p, o = t["subject"], t["predicate"], t["object"]["@value"]
        entities.add(s)
        entities.add(o)
        pair_preds.setdefault((s, o), set()).add(p)
        adjacency.setdefault((s, p), set()).add(o)
        if p in _PROF_OBJ:
            professions[o] = professions.get(o, {})
            professions[o][p] = professions[o].get(p, 0) + 1
        if p == "妻子":
            has_in_wife.add(o)

    out = []
    for spo in spos:
        spo = {**spo, "object": dict(spo["object"]), "object_type": dict(spo["object_type"])}
        s, o = spo["subject"], spo["object"]["@value"]
        if not (s in entities and o in entities) or spo["predicate"] in pair_preds.get((s, o), set()):
            out.append(spo)
            continue
        # conflict-group predicate rewrite (sequential mutation)
        for group in CONFLICT_GROUPS:
            if spo["predicate"] in group:
                for c in group:
                    if c != spo["predicate"] and c in pair_preds.get((s, o), set()) and c != "嘉宾":
                        spo["predicate"] = c
                        st, ot = MY_SCHEMA_DICT[c]
                        spo["subject_type"] = st
                        spo["object_type"]["@value"] = ot["@value"]
        # profession-dominance rewrite
        profs = professions.get(o, {})
        if spo["predicate"] in PROFESSION_CONFLICTS and profs.get(spo["predicate"], 0) == 0:
            for p in PROFESSION_CONFLICTS:
                if profs.get(p, 0) > 30:
                    spo["predicate"] = p
                    break
        # unique-object correction
        emitted = []
        if spo["predicate"] in UNIQUE_PREDICATES:
            for name in sorted(adjacency.get((s, spo["predicate"]), set())):
                if len(name) > 1 and text.find(name) != -1:
                    repl = name if name not in spo["object"]["@value"] else spo["object"]["@value"]
                    if spo["predicate"] != "妻子":
                        spo["object"]["@value"] = repl
                        break
                    new_spo = {**spo, "object": {**spo["object"], "@value": repl}}
                    if new_spo not in emitted:
                        emitted.append(new_spo)
                    if (spo not in emitted and o not in has_in_wife
                            and len(adjacency.get((s, spo["predicate"]), set())) > 1):
                        emitted.append(spo)
        if not emitted:
            emitted = [spo]
        out.extend(emitted)
    # ordered dedup
    dedup = []
    for s_ in out:
        if s_ not in dedup:
            dedup.append(s_)
    return dedup


def _key(t):
    return (t["subject_type"], t["subject"], t["predicate"],
            tuple(sorted(t["object_type"].items())), tuple(sorted(t["object"].items())))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kg_correct_matches_simulator(spark, seed):
    rng = random.Random(seed)
    people = [f"人{c}" for c in "甲乙丙丁戊己庚辛"]
    shows = [f"节目{c}" for c in "一二三"]
    preds = ["妻子", "母亲", "父亲", "嘉宾", "主持人", "主角", "主演", "国籍", "祖籍", "歌手"]

    def rand_triple(url):
        p = rng.choice(preds)
        st, ot = MY_SCHEMA_DICT[p]
        s = rng.choice(shows if p in ("嘉宾", "主持人") else people)
        o = rng.choice(people)
        return {"url": url, "subject_type": st, "subject": s, "predicate": p,
                "object_type": {"@value": ot["@value"]}, "object": {"@value": o}}

    kg_rows = [rand_triple("g") for _ in range(60)]
    docs = {}
    pred_rows = []
    for d in range(12):
        url = f"u{d}"
        spos = [rand_triple(url) for _ in range(rng.randint(1, 5))]
        text = "。".join(f"{t['subject']}与{t['object']['@value']}相关" for t in spos)
        # sprinkle some KG object names into the text for the unique branch
        text += "。" + "".join(rng.choice(people) for _ in range(3))
        docs[url] = text
        pred_rows.extend(spos)

    kg_df = spark.createDataFrame(
        [(t["url"], t["subject_type"], t["subject"], t["predicate"],
          t["object_type"], t["object"]) for t in kg_rows], TRIPLE_SCHEMA)
    edges, vertices = kg_edges(kg_df), kg_vertices(kg_df)
    import pyspark.sql.functions as F

    pred_df = spark.createDataFrame(
        [(t["url"], t["subject_type"], t["subject"], t["predicate"],
          t["object_type"], t["object"]) for t in pred_rows], TRIPLE_SCHEMA)
    texts = spark.createDataFrame(list(docs.items()), "url string, text string")
    got = kg_correct(pred_df.join(texts, "url"), edges, vertices).collect()

    got_keys = {}
    for r in got:
        got_keys.setdefault(r["url"], set()).add(_key({
            "subject_type": r["subject_type"], "subject": r["subject"],
            "predicate": r["predicate"], "object_type": dict(r["object_type"]),
            "object": dict(r["object"])}))

    for url, text in docs.items():
        spos = [t for t in pred_rows if t["url"] == url]
        want = simulate_check_spo(text, spos, kg_rows)
        want_keys = {_key(t) for t in want}
        assert got_keys.get(url, set()) == want_keys, (url, got_keys.get(url), want_keys)


def simulate_self_check(edges, std_triples):
    """Independent mirror of utils/kg.py:332-404 delete rules."""
    genders = {}
    profs = {}
    fict = set()
    for t in std_triples:
        p, s, o = t["predicate"], t["subject"], t["object"]["@value"]
        if p == "妻子":
            genders[s] = "male" if genders.get(s) in (None, "male") else "error"
            genders[o] = "female" if genders.get(o) in (None, "female") else "error"
        if p == "父亲":
            genders[o] = "male" if genders.get(o) in (None, "male") else "error"
        if p == "母亲":
            genders[o] = "female" if genders.get(o) in (None, "female") else "error"
        if p in ("作者", "编剧", "歌手", "制片人", "作词", "导演", "作曲", "主演", "主持人"):
            profs.setdefault(o, set()).add(p)
        if p in ("主角", "配音", "角色", "饰演"):
            fict.add(o)

    pair_preds = {}
    for s, p, o in edges:
        pair_preds.setdefault((s, o), set()).add(p)

    deletions = set()
    for (s, o), preds in pair_preds.items():
        g = genders.get(o, "unknown")
        pr = profs.get(o, set())
        f = o in fict
        # exactly-two gate: all three of 妻子/母亲/父亲 → reference no-op
        if {"母亲", "父亲"} <= preds and "妻子" not in preds:
            if g == "male":
                deletions.add((s, "母亲", o))
            elif g == "female":
                deletions.add((s, "父亲", o))
            elif s[0] == o[0]:
                deletions.add((s, "母亲", o))
            else:
                deletions.add((s, "父亲", o)); deletions.add((s, "母亲", o))
        if {"主角", "主演"} <= preds:
            if "主演" in pr:
                deletions.add((s, "主角", o))
            elif f:
                deletions.add((s, "主演", o))
            else:
                deletions.add((s, "主角", o)); deletions.add((s, "主演", o))
        if {"角色", "主演"} <= preds:
            if "主演" in pr:
                deletions.add((s, "角色", o))
            elif f:
                deletions.add((s, "主演", o))
            else:
                deletions.add((s, "角色", o)); deletions.add((s, "主演", o))
        if {"作者", "主角"} <= preds:
            if "作者" in pr:
                deletions.add((s, "主角", o))
            elif f:
                deletions.add((s, "作者", o))
            else:
                deletions.add((s, "作者", o)); deletions.add((s, "主角", o))
        if {"嘉宾", "主持人"} <= preds:
            if "主持人" in pr:
                deletions.add((s, "嘉宾", o))
            else:
                deletions.add((s, "嘉宾", o)); deletions.add((s, "主持人", o))
    return {e for e in edges if e not in deletions}


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_self_check_matches_simulator(spark, seed):
    from relation_extraction_spark.operators.kg import self_check

    rng = random.Random(seed)
    people = [f"角{c}" for c in "甲乙丙丁"] + [f"同{c}" for c in "同一"]
    conflict_preds = ["妻子", "母亲", "父亲", "主角", "主演", "角色", "作者", "嘉宾", "主持人"]
    edges = set()
    for _ in range(40):
        s, o = rng.choice(people), rng.choice(people)
        if s != o:
            edges.add((s, rng.choice(conflict_preds), o))
    std_rows = []
    for _ in range(30):
        p = rng.choice(["妻子", "父亲", "母亲", "主演", "作者", "主持人", "角色", "饰演"])
        st, ot = MY_SCHEMA_DICT[p]
        s, o = rng.choice(people), rng.choice(people)
        std_rows.append({"url": "g", "subject_type": st, "subject": s, "predicate": p,
                         "object_type": {"@value": ot["@value"]}, "object": {"@value": o}})

    edges_df = spark.createDataFrame(sorted(edges), "subject string, predicate string, object string")
    std_df = spark.createDataFrame(
        [(t["url"], t["subject_type"], t["subject"], t["predicate"],
          t["object_type"], t["object"]) for t in std_rows], TRIPLE_SCHEMA)
    got = {(r["subject"], r["predicate"], r["object"])
           for r in self_check(edges_df, kg_vertices(std_df)).collect()}
    want = simulate_self_check(edges, std_rows)
    assert got == want, (got - want, want - got)


# --- hub-entity stress: adjacency must stay bounded (VERDICT r01 item 3) -----

def test_unique_adjacency_excludes_non_unique_and_caps(spark):
    from pyspark.sql import functions as F

    from relation_extraction_spark.operators.kg import unique_adjacency

    # head entity: 100k 主演 edges (non-unique) + 12 国籍 objects (unique)
    hub_fame = spark.range(100_000).select(
        F.lit("巨星").alias("subject"), F.lit("主演").alias("predicate"),
        F.concat(F.lit("片"), F.col("id").cast("string")).alias("object"))
    hub_nat = spark.range(12).select(
        F.lit("巨星").alias("subject"), F.lit("国籍").alias("predicate"),
        F.concat(F.lit("国"), F.lpad(F.col("id").cast("string"), 2, "0")).alias("object"))
    other = spark.range(5).select(
        F.concat(F.lit("人"), F.col("id").cast("string")).alias("subject"),
        F.lit("妻子").alias("predicate"),
        F.concat(F.lit("妻"), F.col("id").cast("string")).alias("object"))
    edges = hub_fame.unionByName(hub_nat).unionByName(other)

    adj = {r["subject"]: dict(r["kg_adj"])
           for r in unique_adjacency(edges, cap=5).collect()}
    # 100k 主演 edges contribute nothing; 国籍 capped to 5 lexicographically-first
    assert set(adj["巨星"].keys()) == {"国籍"}
    assert list(adj["巨星"]["国籍"]) == [f"国{i:02d}" for i in range(5)]
    assert all(set(v.keys()) == {"妻子"} for k, v in adj.items() if k != "巨星")


def test_fix_spo_hub_entity_completes_unchanged(spark):
    """fix_spo over a KG with a 100k-edge hub subject AND a 100k-in-degree hub
    object (VERDICT r02 item 1): candidate gathering is a plain distinct-edge
    equi-join now — no collect_set ever materializes a 100k-element row — and
    both repairs still fire."""
    from pyspark.sql import functions as F

    from relation_extraction_spark.operators.kg import fix_spo

    # hub subject: 巨星 stars in 100k films (+ one short-name edge 小明)
    hub_out = spark.range(100_000).select(
        F.lit("巨星").alias("subject"), F.lit("主演").alias("predicate"),
        F.concat(F.lit("片"), F.col("id").cast("string")).alias("object"))
    # hub object: 100k distinct people star in 热门片 (+ one 李小龙 edge)
    hub_in = spark.range(100_000).select(
        F.concat(F.lit("人"), F.col("id").cast("string")).alias("subject"),
        F.lit("主演").alias("predicate"), F.lit("热门片").alias("object"))
    extra = spark.createDataFrame(
        [("巨星", "主演", "小明"), ("李小龙", "主演", "热门片")],
        "subject string, predicate string, object string")
    edges = hub_out.unionByName(hub_in).unionByName(extra)

    pred = spark.createDataFrame(
        [
            # case 1: known subject 巨星, unknown person-type object containing 小明
            ("u1", "人物", "巨星", "主演", {"@value": "人物"}, {"@value": "小明的传记"}),
            # case 2: unknown person-type subject containing 李小龙, known object
            ("u2", "人物", "大侠李小龙", "主演", {"@value": "影视作品"}, {"@value": "热门片"}),
        ],
        "url string, subject_type string, subject string, predicate string, "
        "object_type map<string,string>, object map<string,string>")
    rows = {(r["url"], r["subject"], r["object"]["@value"])
            for r in fix_spo(pred, edges).collect()}
    assert rows == {("u1", "巨星", "小明"), ("u2", "李小龙", "热门片")}


def test_kg_correct_hub_entity_completes_unchanged(spark):
    """kg_correct over a KG with a 50k-edge hub subject: the hub's non-unique
    edges never reach the kernel, and corrections still fire."""
    from pyspark.sql import functions as F

    from relation_extraction_spark.operators.kg import kg_correct
    from relation_extraction_spark.schema import TRIPLE_SCHEMA

    hub_fame = spark.range(50_000).select(
        F.lit("巨星").alias("subject"), F.lit("主演").alias("predicate"),
        F.concat(F.lit("片"), F.col("id").cast("string")).alias("object"))
    nat = spark.createDataFrame(
        [("巨星", "国籍", "中国大陆")], "subject string, predicate string, object string")
    edges = hub_fame.unionByName(nat)
    vertices = spark.createDataFrame(
        [("巨星", "unknown", {}, False, False), ("华国", "unknown", {}, False, False),
         ("中国大陆", "unknown", {}, False, False)],
        "entity string, gender string, professions map<string,bigint>, "
        "fictional boolean, has_in_wife boolean")
    t = spark.createDataFrame(
        [("u1", "人物", "巨星", "国籍", {"@value": "国家"}, {"@value": "华国"})],
        "url string, subject_type string, subject string, predicate string, "
        "object_type map<string,string>, object map<string,string>") \
        .withColumn("text", F.lit("巨星的国籍是中国大陆。"))
    out = kg_correct(t.select("url", "text", *TRIPLE_SCHEMA.names[1:]), edges, vertices)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["object"]["@value"] == "中国大陆"

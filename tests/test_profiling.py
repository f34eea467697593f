"""info profiling detectors (reference data/lic_2020.py:817-873):
find_blank → blank_entity_flags, check_company → truncated_company_flags."""

from relation_extraction_spark.operators.profiling import (
    blank_entity_flags,
    truncated_company_flags,
)


def test_blank_entity_flags_first_char_wins(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a\xa0b"), (3, "a　b"), (4, "clean"),
         (5, "x\xa0 y"),   # nbsp at 2 before space at 3 → nbsp
         (6, " lead"), (7, "")],
        "id int, entity string")
    got = {r["id"]: r["blank_kind"] for r in blank_entity_flags(df).collect()}
    assert got == {1: "space", 2: "nbsp", 3: "ideographic",
                   5: "nbsp", 6: "space"}


def test_truncated_company_iterative_extension(spark):
    rows = [
        # two-round chain: 百度 → 百度有限 → 百度有限公司
        (1, "企业", "百度", "百度有限公司成立了"),
        (2, "机构", "腾讯", "这里提到腾讯集团的事"),
        # entity present but no suffix after it → not flagged
        (3, "企业", "阿里", "阿里巴巴是一家企业"),
        # non-company type → never checked (reference gate)
        (4, "人物", "李明", "李明公司不会被检查"),
        # FIRST occurrence wins: 华为科技 comes before 华为技术
        (5, "企业/品牌", "华为", "华为科技与华为技术"),
        # three-round chain exhausts the unroll: X股份 → X股份有限 → X股份有限公司
        (6, "企业", "中车", "中车股份有限公司上市"),
        # entity absent from text → no occurrence, not flagged
        (7, "企业", "字节", "没有提到那家企业"),
        # reference quirk: the occurrence scan is NON-overlapping (KMP
        # restarts at match end). 申申 matches at 0 and 1, but pos 1
        # overlaps pos 0's match, so the suffix after it is never seen
        (8, "企业", "申申", "申申申公司后缀"),
        # ... while a non-overlapping later occurrence IS seen: 木木 at
        # 0 (no suffix) then at 2 → 木木集团
        (9, "企业", "木木", "木木木木集团"),
    ]
    t = spark.createDataFrame(
        rows, "id int, entity_type string, entity string, text string")
    got = {r["id"]: r["extended"] for r in truncated_company_flags(t).collect()}
    assert got == {1: "百度有限公司", 2: "腾讯集团", 5: "华为科技",
                   6: "中车股份有限公司", 9: "木木集团"}


def test_truncated_company_matches_reference_loop(spark):
    """Differential vs a literal transcription of the reference's
    check_company while-loop (data/lic_2020.py:840-856), over a generated
    corpus with planted suffixes at varied positions."""
    SUFFIXES = ("公司", "有限", "股份", "责任", "集团", "科技", "管理", "汽车")

    def ref_extend(text, entity, rounds=3):
        for _ in range(rounds):
            hit = None
            start = 0
            n = len(entity)
            while True:
                s = text.find(entity, start)
                if s < 0:
                    break
                if text[s + n:s + n + 2] in SUFFIXES:
                    hit = s
                    break
                start = s + n  # reference locate_entity: non-overlapping scan
            if hit is None:
                return entity
            entity = text[hit:hit + n + 2]
        return entity

    rows = []
    for i in range(60):
        sfx = SUFFIXES[i % len(SUFFIXES)]
        if i % 3 == 0:
            # self-overlapping entity + a run of its char: exercises the
            # non-overlapping scan's skip behavior
            ent = "申申"
            text = f"前{'申' * (i % 4)}{ent}{sfx}中{ent}{ent}科技尾"
        else:
            ent = f"企{i % 7}号"
            text = f"前缀{'废' * (i % 5)}{ent}{sfx}后缀{ent}科技尾"
        rows.append((i, "企业", ent, text))
    t = spark.createDataFrame(
        rows, "id int, entity_type string, entity string, text string")
    got = {r["id"]: r["extended"] for r in truncated_company_flags(t).collect()}
    for i, _, ent, text in rows:
        want = ref_extend(text, ent)
        if want != ent:
            assert got[i] == want, (i, text)
        else:
            assert i not in got

"""Predicate schema + Spark StructTypes for the KG-construction pipeline.

The DuIE 2.0 schema (48 raw predicates, public competition data) plus the
reference's hand-expansion to 54 "simple" predicates: the five complex
predicates 配音/上映时间/票房/获奖/饰演 decompose into helper predicates
角色/上映地点-时间/票房区域/作品/作品获奖/奖项时间/参与影视作品, and 丈夫 is
normalized away as inverse-妻子 (reference: data/lic_2020.py:313-391,645-656;
type vocabularies data/lic_2020.py:67-71; functional predicates utils/kg.py:11-13;
unique/conflict groups utils/kg.py:195-197).

Everything here is a literal table → Catalyst constant-folds it and every join
against it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- type vocabularies (closed lists; reference data/lic_2020.py:67-71) -----

SUBJECT_TYPES = [
    "图书作品", "企业/品牌", "学校", "歌曲", "行政区", "文学作品", "景点", "Number",
    "奖项", "人物", "国家", "历史人物", "地点", "电视综艺", "机构", "娱乐人物",
    "学科专业", "作品", "影视作品", "企业",
]
OBJECT_TYPES = [
    "学校", "歌曲", "气候", "奖项", "Text", "音乐专辑", "人物", "国家", "企业",
    "地点", "作品", "城市", "语言", "影视作品", "Date", "Number",
]

# --- raw DuIE 2.0 schema: (predicate, subject_type, {slot: object_type}) ----

RAW_SCHEMA: list[tuple[str, str, dict[str, str]]] = [
    ("注册资本", "企业", {"@value": "Number"}),
    ("作者", "图书作品", {"@value": "人物"}),
    ("所属专辑", "歌曲", {"@value": "音乐专辑"}),
    ("上映时间", "影视作品", {"@value": "Date", "inArea": "地点"}),
    ("票房", "影视作品", {"@value": "Number", "inArea": "地点"}),
    ("简称", "机构", {"@value": "Text"}),
    ("主持人", "电视综艺", {"@value": "人物"}),
    ("嘉宾", "电视综艺", {"@value": "人物"}),
    ("配音", "娱乐人物", {"@value": "人物", "inWork": "影视作品"}),
    ("获奖", "娱乐人物", {"@value": "奖项", "inWork": "作品", "onDate": "Date", "period": "Number"}),
    ("饰演", "娱乐人物", {"@value": "人物", "inWork": "影视作品"}),
    ("妻子", "人物", {"@value": "人物"}),
    ("丈夫", "人物", {"@value": "人物"}),
    ("父亲", "人物", {"@value": "人物"}),
    ("母亲", "人物", {"@value": "人物"}),
    ("董事长", "企业", {"@value": "人物"}),
    ("创始人", "企业", {"@value": "人物"}),
    ("总部地点", "企业", {"@value": "地点"}),
    ("成立日期", "机构", {"@value": "Date"}),
    ("朝代", "历史人物", {"@value": "Text"}),
    ("号", "历史人物", {"@value": "Text"}),
    ("毕业院校", "人物", {"@value": "学校"}),
    ("国籍", "人物", {"@value": "国家"}),
    ("祖籍", "人物", {"@value": "地点"}),
    ("出品公司", "影视作品", {"@value": "企业"}),
    ("导演", "影视作品", {"@value": "人物"}),
    ("编剧", "影视作品", {"@value": "人物"}),
    ("主演", "影视作品", {"@value": "人物"}),
    ("主角", "文学作品", {"@value": "人物"}),
    ("改编自", "影视作品", {"@value": "作品"}),
    ("歌手", "歌曲", {"@value": "人物"}),
    ("作曲", "歌曲", {"@value": "人物"}),
    ("作词", "歌曲", {"@value": "人物"}),
    ("主题曲", "影视作品", {"@value": "歌曲"}),
    ("制片人", "影视作品", {"@value": "人物"}),
    ("校长", "学校", {"@value": "人物"}),
    ("海拔", "地点", {"@value": "Number"}),
    ("占地面积", "机构", {"@value": "Number"}),
    ("面积", "行政区", {"@value": "Number"}),
    ("人口数量", "行政区", {"@value": "Number"}),
    ("邮政编码", "行政区", {"@value": "Text"}),
    ("首都", "国家", {"@value": "城市"}),
    ("官方语言", "国家", {"@value": "语言"}),
    ("气候", "行政区", {"@value": "气候"}),
    ("所在城市", "景点", {"@value": "城市"}),
    ("专业代码", "学科专业", {"@value": "Text"}),
    ("修业年限", "学科专业", {"@value": "Number"}),
    ("代言人", "企业/品牌", {"@value": "人物"}),
]
assert len(RAW_SCHEMA) == 48, len(RAW_SCHEMA)

# helper predicates introduced by the complex→simple expansion
# (reference data/lic_2020.py:313-391)
EXPANSION_SCHEMA: list[tuple[str, str, dict[str, str]]] = [
    ("角色", "影视作品", {"@value": "人物"}),
    ("上映地点-时间", "地点", {"@value": "Date"}),
    ("票房区域", "Number", {"@value": "地点"}),
    ("作品", "娱乐人物", {"@value": "作品"}),
    ("作品获奖", "作品", {"@value": "奖项"}),
    ("奖项时间", "奖项", {"@value": "Date"}),
    ("参与影视作品", "人物", {"@value": "影视作品"}),
]

# expanded ("my") schema: raw minus 丈夫 (normalized to 妻子) plus the helpers
MY_SCHEMA: list[tuple[str, str, dict[str, str]]] = [
    s for s in RAW_SCHEMA if s[0] != "丈夫"
] + EXPANSION_SCHEMA
assert len(MY_SCHEMA) == 54, len(MY_SCHEMA)

RAW_SCHEMA_DICT = {p: (st, ot) for p, st, ot in RAW_SCHEMA}
MY_SCHEMA_DICT = {p: (st, ot) for p, st, ot in MY_SCHEMA}

PREDICATES = [p for p, _, _ in MY_SCHEMA]
PRED2ID = {p: i for i, p in enumerate(PREDICATES)}
ID2PRED = dict(enumerate(PREDICATES))

NUM_SCHEMA = 54
NUM_SBJ_TYPE = 20
MAX_TOKENS = 203  # reference MAX_LENGTH=205 including [CLS]/[SEP]; we carry no specials

COMPLEX_PREDICATES = ("配音", "上映时间", "票房", "获奖", "饰演")
# predicates touched by recomposition (reference data/lic_2020.py:559-560)
COMBINE_PREDICATES = frozenset(
    ["配音", "角色", "上映时间", "上映地点-时间", "票房", "票房区域",
     "获奖", "作品", "作品获奖", "奖项时间", "饰演", "参与影视作品"]
)
# single-valued ("functional") predicates for the flat KG (utils/kg.py:11-13)
FUNCTIONAL_PREDICATES = (
    "主题曲", "父亲", "母亲", "注册资本", "气候", "朝代", "面积", "总部地点",
    "修业年限", "所在城市", "改编自", "成立日期", "海拔", "国籍", "祖籍",
    "专业代码", "邮政编码", "首都",
)
# unique predicates for object correction (utils/kg.py:195)
UNIQUE_PREDICATES = ("父亲", "母亲", "改编自", "国籍", "祖籍", "专业代码", "邮政编码", "妻子")
# conflict groups for predicate rewrite (utils/kg.py:196-197)
CONFLICT_GROUPS = (
    ("妻子", "母亲", "父亲"),
    ("嘉宾", "主持人"),
    ("主角", "主演"),
    ("角色", "主演"),
    ("作者", "主角"),
)
PROFESSION_CONFLICTS = ("歌手", "作词", "作曲")
# degenerate self-loop whitelist (data/lic_2020.py:692)
SELF_LOOP_OK = ("改编自", "所属专辑", "主题曲")

# --- Spark types -------------------------------------------------------------

SPAN = T.StructType([T.StructField("s", T.IntegerType()), T.StructField("e", T.IntegerType())])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

TOKENIZED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("text", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.StringType())),
    T.StructField("starts", T.ArrayType(T.IntegerType())),   # token → char start
    T.StructField("ends", T.ArrayType(T.IntegerType())),     # token → char end (inclusive)
    T.StructField("hand", T.ArrayType(T.IntegerType())),     # split-char hand feature
])

# one row per extracted triple, token-span variant (pre-formalize)
RAW_TRIPLE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("predicate_id", T.IntegerType()),
    T.StructField("subject_tok", T.ArrayType(SPAN)),   # all token-span occurrences
    T.StructField("object_tok", T.ArrayType(SPAN)),
])

# formal triple (reference dict shape, data/lic_2020.py:271-278)
TRIPLE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("subject_type", T.StringType()),
    T.StructField("subject", T.StringType()),
    T.StructField("predicate", T.StringType()),
    T.StructField("object_type", T.MapType(T.StringType(), T.StringType())),
    T.StructField("object", T.MapType(T.StringType(), T.StringType())),
])

EDGE_SCHEMA = T.StructType([
    T.StructField("subject", T.StringType()),
    T.StructField("predicate", T.StringType()),
    T.StructField("object", T.StringType()),
])


class DatasetSchema:
    """Pluggable predicate schema for the extraction cascade.

    The reference binds schemas per dataset: LIC2020 (DuIE 2.0, complex
    objects + rewrites) vs LIC2019 (DuIE 1.0, 50 FLAT predicates,
    @value-only objects, no complex recomposition — reference
    data/lic_2019.py:44-77 builds pred/type id maps from plain schema rows
    and its formal path never runs expand/combine). ``rewrites`` gates the
    R1/R2/R3 complex-triple machinery.
    """

    def __init__(self, rows: list[tuple[str, str, dict[str, str]]], rewrites: bool):
        self.schema_dict = {p: (st, ot) for p, st, ot in rows}
        self.predicates = [p for p, _, _ in rows]
        self.pred2id = {p: i for i, p in enumerate(self.predicates)}
        self.id2pred = dict(enumerate(self.predicates))
        self.rewrites = rewrites


LIC2020_SCHEMA = DatasetSchema(MY_SCHEMA, rewrites=True)


def flat_schema(rows: list[tuple[str, str, str]]) -> DatasetSchema:
    """LIC2019-style flat schema: (predicate, subject_type, object_type)
    rows, @value-only objects, complex rewrites bypassed."""
    return DatasetSchema([(p, st, {"@value": ot}) for p, st, ot in rows],
                         rewrites=False)


def schema_predicates_df(spark: SparkSession) -> DataFrame:
    """54-row broadcastable predicate table (FIXTURES.md §2)."""
    rows = []
    for i, (p, st, ot) in enumerate(MY_SCHEMA):
        rows.append((
            p, i, st, ot,
            p in COMPLEX_PREDICATES,
            p in FUNCTIONAL_PREDICATES,
        ))
    return spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("predicate", T.StringType(), False),
            T.StructField("predicate_id", T.IntegerType(), False),
            T.StructField("subject_type", T.StringType(), False),
            T.StructField("object_type", T.MapType(T.StringType(), T.StringType()), False),
            T.StructField("is_complex", T.BooleanType(), False),
            T.StructField("is_functional", T.BooleanType(), False),
        ]),
    )

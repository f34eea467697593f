"""Deterministic synthetic web-page corpus with planted gold triples.

Stands in for the Common-Crawl-style input (BASELINE.json input_hint) and the
DuIE dev set (FIXTURES.md §1/§3). Every row is a pure function of the row
index ``i`` — no RNG state — so generation is partition-count-invariant and
the same corpus can be built driver-side (tests) or distributed via
``spark.range(n)`` (bench at any scale).

Template grammar: each document concatenates 1-3 sentences, each planting the
simple triples one of the predicate templates implies. The *expected* output
triples (complex, post combine+postprocess, including derived spouse edges and
the 届-period slot — reference data/lic_2020.py:113-174,394-574) are
hand-specified per template, NOT computed with the pipeline's own kernels, so
the end-to-end P/R check is a genuine oracle.

Entity surface forms use category prefixes (李明N 神作N 金曲N 金奖N 江城N
机构N) so the surrogate scorer can locate them with anchored regexes, the way
the trained model in the reference locates them with pointer networks.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .schema import DOCUMENTS_SCHEMA, TRIPLE_SCHEMA

EPOCH = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)

# whitespace edge cases the tokenizer must survive (reference utils/base.py:78-100)
FILLERS = [
    "",
    "今日\xa0快讯：",
    "本报　讯：",
    "“重磅”消息，",
    "记者 从 现场获悉，",  # CJK-adjacent single spaces → sentinel tokens
    "news  flash:",        # double ASCII space
]


def _t(st: str, s: str, p: str, ot: dict[str, str], o: dict[str, str]) -> dict[str, Any]:
    return {"subject_type": st, "subject": s, "predicate": p, "object_type": ot, "object": o}


def _sentence_author(i: int) -> tuple[str, list[dict]]:
    w, p = f"神作{i % 89}", f"李明{i % 97}"
    return (
        f"《{w}》是{p}写的图书作品。",
        [_t("图书作品", w, "作者", {"@value": "人物"}, {"@value": p})],
    )


def _sentence_wife(i: int) -> tuple[str, list[dict]]:
    a, b = f"李明{i % 97}", f"李明{(i + 1) % 97}"
    # postprocess_1/home_relation derives the inverse 丈夫 edge
    return (
        f"{a}的妻子是{b}。",
        [
            _t("人物", a, "妻子", {"@value": "人物"}, {"@value": b}),
            _t("人物", b, "丈夫", {"@value": "人物"}, {"@value": a}),
        ],
    )


def _sentence_parents(i: int) -> tuple[str, list[dict]]:
    c, f, m = f"李明{i % 97}", f"李明{(i + 3) % 97}", f"李明{(i + 5) % 97}"
    return (
        f"{c}的父亲是{f}，{c}的母亲是{m}。",
        [
            _t("人物", c, "父亲", {"@value": "人物"}, {"@value": f}),
            _t("人物", c, "母亲", {"@value": "人物"}, {"@value": m}),
            # derived spouse edges (reference data/lic_2020.py:164-170)
            _t("人物", m, "丈夫", {"@value": "人物"}, {"@value": f}),
            _t("人物", f, "妻子", {"@value": "人物"}, {"@value": m}),
        ],
    )


def _sentence_dub(i: int) -> tuple[str, list[dict]]:
    a, w, r = f"李明{i % 97}", f"神作{i % 89}", f"李明{(i + 7) % 97}"
    return (
        f"{a}在《{w}》中为{r}配音。",
        [_t("娱乐人物", a, "配音", {"inWork": "影视作品", "@value": "人物"},
            {"inWork": w, "@value": r})],
    )


def _sentence_release(i: int) -> tuple[str, list[dict]]:
    w, c = f"神作{i % 89}", f"江城{i % 31}"
    d = f"2019年{i % 12 + 1}月{i % 28 + 1}日"
    return (
        f"《{w}》于{d}在{c}上映。",
        [_t("影视作品", w, "上映时间", {"inArea": "地点", "@value": "Date"},
            {"inArea": c, "@value": d})],
    )


def _sentence_boxoffice(i: int) -> tuple[str, list[dict]]:
    w, c, n = f"神作{i % 89}", f"江城{i % 31}", f"{i % 50 + 1}亿"
    return (
        f"《{w}》在{c}的票房达到{n}。",
        [_t("影视作品", w, "票房", {"inArea": "地点", "@value": "Number"},
            {"inArea": c, "@value": n})],
    )


_CN_NUM = ["一", "二", "三", "四", "五", "六", "七", "八", "九", "十", "十一", "十二"]


def _sentence_award(i: int) -> tuple[str, list[dict]]:
    p, w, a = f"李明{i % 97}", f"神作{i % 89}", f"金奖{i % 23}"
    period = _CN_NUM[i % 12]
    return (
        f"{p}凭借《{w}》荣获第{period}届{a}。",
        [_t("娱乐人物", p, "获奖",
            {"inWork": "作品", "@value": "奖项", "period": "Number"},
            {"inWork": w, "@value": a, "period": period})],
    )


def _sentence_portray(i: int) -> tuple[str, list[dict]]:
    a, w, r = f"李明{i % 97}", f"神作{i % 89}", f"李明{(i + 11) % 97}"
    return (
        f"{a}在《{w}》中饰演{r}。",
        [_t("娱乐人物", a, "饰演", {"inWork": "影视作品", "@value": "人物"},
            {"inWork": w, "@value": r})],
    )


def _sentence_nationality(i: int) -> tuple[str, list[dict]]:
    p = f"李明{i % 97}"
    return (f"{p}的国籍是中国。", [_t("人物", p, "国籍", {"@value": "国家"}, {"@value": "中国"})])


def _sentence_founded(i: int) -> tuple[str, list[dict]]:
    c = f"机构{i % 41}"
    d = f"2008年{i % 12 + 1}月{i % 28 + 1}日"
    return (f"{c}成立日期为{d}。", [_t("机构", c, "成立日期", {"@value": "Date"}, {"@value": d})])


def _sentence_singer(i: int) -> tuple[str, list[dict]]:
    s, p = f"金曲{i % 53}", f"李明{i % 97}"
    return (f"{s}是{p}演唱的歌曲。", [_t("歌曲", s, "歌手", {"@value": "人物"}, {"@value": p})])


def _sentence_star_multi(i: int) -> tuple[str, list[dict]]:
    # multi-object fan-out: one subject, two 主演 objects
    w, p, q = f"神作{i % 89}", f"李明{i % 97}", f"李明{(i + 13) % 97}"
    return (
        f"《{w}》由{p}和{q}主演。",
        [
            _t("影视作品", w, "主演", {"@value": "人物"}, {"@value": p}),
            _t("影视作品", w, "主演", {"@value": "人物"}, {"@value": q}),
        ],
    )


def _sentence_repeat(i: int) -> tuple[str, list[dict]]:
    # multi-occurrence: subject surface appears twice in the document
    s, p = f"金曲{i % 53}", f"李明{i % 97}"
    return (
        f"{s}是{p}演唱的歌曲，{s}广受欢迎。",
        [_t("歌曲", s, "歌手", {"@value": "人物"}, {"@value": p})],
    )


TEMPLATES = [
    _sentence_author,
    _sentence_wife,
    _sentence_parents,
    _sentence_dub,
    _sentence_release,
    _sentence_boxoffice,
    _sentence_award,
    _sentence_portray,
    _sentence_nationality,
    _sentence_founded,
    _sentence_singer,
    _sentence_star_multi,
    _sentence_repeat,
]


def gen_row(i: int) -> dict[str, Any]:
    """One synthetic document + its expected final triples, purely from i."""
    if i % 20 == 19:  # 5% non-Chinese rows: filtered out by the pipeline
        text = f"english filler document number {i} with no relations at all."
        gold: list[dict] = []
        lang = "en"
    else:
        n_sent = i % 3 + 1
        parts = [FILLERS[i % len(FILLERS)]]
        gold = []
        for k in range(n_sent):
            t = TEMPLATES[(i * 3 + k * 5) % len(TEMPLATES)]
            sent, g = t(i + k)
            parts.append(sent)
            gold.extend(g)
        text = "".join(parts)
        lang = "zh"
    # domain skew: every 5th row lands in one of 3 hot domains (FIXTURES.md §1)
    dom = i % 3 if i % 5 == 0 else i % 101
    url = f"https://site{dom}.example/page/{i}"
    html = f"<html><body><p>{text}</p></body></html>".encode("utf-8")
    return {
        "url": url,
        "warc_ts": EPOCH + dt.timedelta(seconds=137 * i),
        "html": html,
        "text": text,
        "lang": lang,
        "gold": gold,
    }


def documents_df(spark: SparkSession, n: int) -> DataFrame:
    rows = []
    for i in range(n):
        r = gen_row(i)
        rows.append((r["url"], r["warc_ts"].replace(tzinfo=None), r["html"], r["text"], r["lang"]))
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def gold_triples_df(spark: SparkSession, n: int) -> DataFrame:
    rows = []
    for i in range(n):
        r = gen_row(i)
        for g in r["gold"]:
            rows.append((r["url"], g["subject_type"], g["subject"], g["predicate"],
                         g["object_type"], g["object"]))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def documents_df_distributed(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Scale path: generate the corpus with spark.range → mapInPandas (no
    driver materialization); identical content to :func:`documents_df`."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            recs = [gen_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame({
                "url": [r["url"] for r in recs],
                "warc_ts": [r["warc_ts"].replace(tzinfo=None) for r in recs],
                "html": [r["html"] for r in recs],
                "text": [r["text"] for r in recs],
                "lang": [r["lang"] for r in recs],
            })

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)

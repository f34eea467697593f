"""Fused SPO extraction stage + html→text extraction (SURVEY.md §3.2).

``extract_text_df`` is stage 1: a vectorized Arrow UDF producing byte-identical
text per url (BASELINE.json input_hint) — pure function of the html bytes, no
locale/env dependence. Rows whose ``text`` is already populated are passed
through untouched.

``extract_triples`` is stages 2-5 fused into ONE ``mapInPandas`` operator:
tokenize+align → score → subject decode → per-subject object decode → SPO
assembly → formalize → combine → postprocess. The reference pays 4 GPU↔CPU
transfers per batch plus a file handoff between model and postprocessing
(reference main.py:273-291, model/hbt.py:562-588); here the entire
subject→object cascade and all per-document rewrites stay inside one Arrow
batch function, so end-to-end extraction is a single no-shuffle stage — this
is what makes the N→4N scaling linear: throughput is bounded only by input
split parallelism.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from ..schema import LIC2020_SCHEMA, TRIPLE_SCHEMA
from .decode import assemble_spos, decode_objects, decode_subjects
from .rewrite import combine_spos, postprocess_1
from .scorer import SurrogateScorer

_SCRIPT_RX = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_TAG_RX = re.compile(r"<[^>]+>")
_WS_RX = re.compile(r"[ \t\r\n]+")


def extract_text_bytes(html_bytes: bytes | None) -> str:
    """Deterministic html→text: drop script/style, strip tags, unescape.

    The synthetic corpus wraps text as ``<p>{text}</p>`` with no entities or
    nested markup, so extraction recovers the original text byte-identically.
    """
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    raw = _SCRIPT_RX.sub("", raw)
    body = []
    for m in re.finditer(r"(?is)<p[^>]*>(.*?)</p>", raw):
        body.append(m.group(1))
    if not body:
        stripped = _TAG_RX.sub("", raw)
        body = [_WS_RX.sub(" ", stripped).strip()]
    return _html.unescape("".join(_TAG_RX.sub("", b) for b in body))


@F.pandas_udf(StringType())
def _extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_bytes)


def extract_text_df(docs: DataFrame) -> DataFrame:
    """Populate ``text`` from ``html`` where missing (skip when present)."""
    need = (F.col("text").isNull()) | (F.length("text") == 0)
    return docs.withColumn(
        "text", F.when(need, _extract_text_udf(F.col("html"))).otherwise(F.col("text"))
    )


def decode_document(text: str, scorer, schema=None) -> list[dict]:
    """Run the full per-document cascade; returns final formal triples.

    ``schema`` (DatasetSchema, default LIC2020) supplies the predicate-id
    vocabulary + types and gates the complex-triple rewrites: a flat schema
    (LIC2019-style, reference data/lic_2019.py) skips combine/postprocess
    entirely — flat predicates have nothing to recompose."""
    schema = schema or LIC2020_SCHEMA
    tokens, starts, ends, sbj_channels, word_mask, obj_map = scorer.score(text)
    if not sbj_channels:
        return []
    from .decode import word_limit_maps

    limits = word_limit_maps(word_mask)
    sbj_keys, sbj_groups = decode_subjects(tokens, sbj_channels, word_mask, limits)

    def surface(span_group: list[tuple[int, int]]) -> str:
        s, e = span_group[0]
        return text[starts[s] : ends[e] + 1].strip()

    objects_per_subject = []
    for key, spans in zip(sbj_keys, sbj_groups):
        channels = obj_map.get(surface(spans), {})
        objects_per_subject.append(decode_objects(tokens, channels, word_mask, limits))

    spos = []
    for sbj_spans, pred_id, obj_spans in assemble_spos(sbj_groups, objects_per_subject):
        pred = schema.id2pred[pred_id]
        st, ot = schema.schema_dict[pred]
        spos.append({
            "subject_type": st,
            "subject": surface(sbj_spans),
            "predicate": pred,
            "object_type": {"@value": ot["@value"]},
            "object": {"@value": surface(obj_spans)},
        })
    if schema.rewrites:
        spos = combine_spos(spos)
        spos = postprocess_1(text, spos)
    return spos


def fused_extract_stage(docs: DataFrame, decode_fn, lang: str | None = "zh") -> DataFrame:
    """The single fused mapInPandas stage shared by every extraction path
    (primary cascade, HotPoint twin): lang filter BEFORE any Python, then
    per-document ``decode_fn(text) → list[spo dict]`` inside one Arrow batch
    function — zero shuffles from scan to formal triples."""
    src = docs
    if lang is not None and "lang" in docs.columns:
        src = src.filter(F.col("lang") == lang)
    src = src.select("url", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "subject_type", "subject", "predicate",
                                   "object_type", "object")}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                for spo in decode_fn(text):
                    out["url"].append(url)
                    out["subject_type"].append(spo["subject_type"])
                    out["subject"].append(spo["subject"])
                    out["predicate"].append(spo["predicate"])
                    out["object_type"].append(spo["object_type"])
                    out["object"].append(spo["object"])
            # dtype=object keeps empty batches Arrow-convertible (map columns)
            yield pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in out.items()})

    return src.mapInPandas(run, schema=TRIPLE_SCHEMA)


def extract_triples(docs: DataFrame, scorer=None, lang: str | None = "zh",
                    schema=None) -> DataFrame:
    """documents(url, text, lang, ...) → triples DataFrame (TRIPLE_SCHEMA).

    ``schema``: DatasetSchema — LIC2020 (default) or a flat LIC2019-style
    schema from :func:`relation_extraction_spark.schema.flat_schema`."""
    scorer = scorer or SurrogateScorer()
    return fused_extract_stage(
        docs, lambda text: decode_document(text, scorer, schema), lang)

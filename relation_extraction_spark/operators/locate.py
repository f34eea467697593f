"""J1: entity-occurrence locate — ALL substring occurrences of each entity in
each document (training-label projection; reference main.py:60-72 +
utils/kmp.py, char-level variant data/lic_2020.py:86-105).

DataFrame shape: documents ⋈ entities (broadcast — entity lists are small
relative to the corpus), then a vectorized scan yields one row per (url,
entity) with the occurrence span list. Count-only projection is pure SQL
(length-difference trick), used by the driver oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

LOCATE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("entity", T.StringType()),
    T.StructField("n_occ", T.IntegerType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("s", T.IntegerType()), T.StructField("e", T.IntegerType()),
    ]))),
])


def all_occurrences(text: str, entity: str) -> list[tuple[int, int]]:
    out = []
    if not entity:
        return out
    i = 0
    while True:
        i = text.find(entity, i)
        if i < 0:
            return out
        out.append((i, i + len(entity) - 1))
        i += len(entity)  # non-overlapping, like the reference's KMP restart


MAX_BROADCAST_ENTITIES = 1_000_000


def _spans_frame(rows: list[tuple]) -> pd.DataFrame:
    """(url, entity, n_occ, spans) tuples → the LOCATE_SCHEMA frame."""
    return pd.DataFrame({
        "url": [r[0] for r in rows],
        "entity": [r[1] for r in rows],
        "n_occ": pd.Series([r[2] for r in rows], dtype="int32"),
        "spans": pd.Series([r[3] for r in rows], dtype=object),
    })


def locate_doc_entities(docs: DataFrame, doc_entities: DataFrame,
                        id_col: str = "url", text_col: str = "text") -> DataFrame:
    """Per-document locate — each document scans only its OWN entities,
    matching the reference exactly: main.py:380-405 calls
    locate_entity(text, e) for the entities of that document's spo list, not
    a global vocabulary.

    ``doc_entities``: (id_col, entity) rows. The entity lists are aggregated
    per document (bounded by the doc's own triple count), joined to the text,
    and one Arrow pass scans each text against its list — cost scales with
    the DATA, not with a vocabulary, and nothing touches the driver. This is
    the 100-TB path; ``locate_entities`` below is the small-fixed-vocabulary
    convenience variant."""
    ents = (
        doc_entities.select(F.col(id_col).cast("string").alias("url"),
                            "entity")
        .dropDuplicates()
        .groupBy("url")
        .agg(F.sort_array(F.collect_set("entity")).alias("_ents"))
    )
    src = docs.select(
        F.col(id_col).cast("string").alias("url"), F.col(text_col).alias("text")
    ).join(ents, "url", "inner")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text, ent_list in zip(pdf["url"], pdf["text"], pdf["_ents"]):
                for ent in ent_list:
                    spans = all_occurrences(text or "", ent)
                    rows.append((url, ent, len(spans), spans))
            yield _spans_frame(rows)

    return src.mapInPandas(run, schema=LOCATE_SCHEMA)


def locate_entities(docs: DataFrame, entities: DataFrame,
                    id_col: str = "url", text_col: str = "text",
                    max_entities: int = MAX_BROADCAST_ENTITIES) -> DataFrame:
    """One row per (url, entity) with the occurrence span list.

    The entity list is collected + broadcast (small by contract — it is the
    training-label vocabulary) and the scan runs per DOCUMENT: each text
    crosses the Arrow boundary exactly once, not once per entity as a
    crossJoin-then-UDF plan would ship it. A guard count fails fast with an
    actionable message instead of a driver OOM when the 'small' contract is
    violated — use ``locate_doc_entities`` for data-scaled entity sets."""
    # one action: the collect is bounded at max_entities+1 rows, so the
    # guard and the vocabulary come from the same (safe) scan
    rows = entities.select("entity").dropDuplicates().limit(max_entities + 1).collect()
    if len(rows) > max_entities:
        raise ValueError(
            f"locate_entities: entity vocabulary exceeds {max_entities} rows; "
            "this variant broadcasts the vocabulary from the driver. Use "
            "locate_doc_entities (per-document entity lists) instead.")
    ents = sorted(r["entity"] for r in rows)
    bc = docs.sparkSession.sparkContext.broadcast(ents)
    src = docs.select(
        F.col(id_col).cast("string").alias("url"), F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        entity_list = bc.value
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["text"]):
                for ent in entity_list:
                    spans = all_occurrences(text or "", ent)
                    rows.append((url, ent, len(spans), spans))
            yield _spans_frame(rows)

    return src.mapInPandas(run, schema=LOCATE_SCHEMA)


def occurrence_counts_sql_style(docs: DataFrame, entities: DataFrame,
                                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Count-only variant in pure Catalyst (oracle-able): occurrences =
    floor((len(text) - len(replace(text, entity))) / len(entity)) — the
    quotient is always an exact integer, but the floor is explicit per the
    repo's oracle float rule (Spark int-cast truncates, DuckDB rounds)."""
    j = docs.select(id_col, text_col).crossJoin(
        F.broadcast(entities.select("entity").dropDuplicates()))
    n = F.floor((F.length(text_col) - F.length(F.replace(F.col(text_col), F.col("entity"))))
                / F.length("entity")).cast("int")
    return j.select(id_col, "entity", n.alias("n_occ"))

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


def locate_entities(docs: DataFrame, entities: DataFrame,
                    id_col: str = "url", text_col: str = "text") -> DataFrame:
    joined = docs.select(
        F.col(id_col).cast("string").alias("url"), F.col(text_col).alias("text")
    ).crossJoin(F.broadcast(entities.select("entity").dropDuplicates()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text, ent in zip(pdf["url"], pdf["text"], pdf["entity"]):
                spans = all_occurrences(text or "", ent)
                rows.append((url, ent, len(spans), spans))
            yield pd.DataFrame({
                "url": [r[0] for r in rows],
                "entity": [r[1] for r in rows],
                "n_occ": pd.Series([r[2] for r in rows], dtype="int32"),
                "spans": pd.Series([r[3] for r in rows], dtype=object),
            })

    return joined.mapInPandas(run, schema=LOCATE_SCHEMA)


def occurrence_counts_sql_style(docs: DataFrame, entities: DataFrame,
                                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Count-only variant in pure Catalyst (oracle-able): occurrences =
    (len(text) - len(replace(text, entity))) / len(entity)."""
    j = docs.select(id_col, text_col).crossJoin(
        F.broadcast(entities.select("entity").dropDuplicates()))
    n = ((F.length(text_col) - F.length(F.replace(F.col(text_col), F.col("entity"))))
         / F.length("entity")).cast("int")
    return j.select(id_col, "entity", n.alias("n_occ"))

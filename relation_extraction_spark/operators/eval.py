"""Exact-match SPO scoring (J2 + A1): micro P/R/F1 via joins.

Reference semantics: a predicted triple is correct iff an identical triple
(all fields, object compared as a whole map) exists for the same document
(reference main.py:101-110, utils/metrics.py:1-13). Implemented as an inner
join on a canonical triple key — `left_anti` gives false positives/negatives
for debugging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_triple_key(df: DataFrame) -> DataFrame:
    """Append a deterministic string key encoding the full triple.

    JSON-encoded (to_json escapes delimiters), with map entries sorted by
    key — an injective encoding: web-text values containing '=', ';', '|'
    or quotes can never make two distinct triples collide (a plain
    concat_ws key would merge e.g. object {"@value":"x","inWork":"y"} with
    object {"@value":"x;inWork=y"})."""
    map_ent = lambda c: F.sort_array(F.transform(  # noqa: E731
        F.map_entries(c), lambda e: F.struct(e.key.alias("k"), e.value.alias("v"))))
    return df.withColumn(
        "triple_key",
        F.to_json(F.struct(
            F.col("subject_type").alias("st"), F.col("subject").alias("s"),
            F.col("predicate").alias("p"),
            map_ent(F.col("object_type")).alias("ot"),
            map_ent(F.col("object")).alias("o"),
        )),
    )


def micro_prf(pred: DataFrame, gold: DataFrame) -> dict[str, float]:
    # ONE action: full-outer join with presence markers, then a single
    # global aggregate — the round-7 form ran three jobs (inner-join count
    # + two counts) over persisted sides; each side's upstream (typically
    # the full extraction cascade) now executes exactly once with no cache
    # residency at all
    p = canonical_triple_key(pred).select(
        "url", "triple_key").dropDuplicates().withColumn("_p", F.lit(1))
    g = canonical_triple_key(gold).select(
        "url", "triple_key").dropDuplicates().withColumn("_g", F.lit(1))
    row = (
        p.join(g, ["url", "triple_key"], "full_outer")
        .agg(
            F.count(F.when(F.col("_p").isNotNull()
                           & F.col("_g").isNotNull(), F.lit(1))).alias("c"),
            F.count("_p").alias("pn"),
            F.count("_g").alias("gn"),
        ).collect()[0]
    )
    correct, pred_n, true_n = row["c"], row["pn"], row["gn"]
    precision = correct / pred_n if pred_n else 0.0
    recall = correct / true_n if true_n else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"correct": correct, "pred": pred_n, "true": true_n,
            "precision": precision, "recall": recall, "f1": f1}


def diff_triples(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """SE3: triples in a not in b, and vice versa (reference data/lic_2020.py:876-895)."""
    ka = canonical_triple_key(a)
    kb = canonical_triple_key(b)
    only_a = ka.join(kb.select("url", "triple_key"), ["url", "triple_key"], "left_anti")
    only_b = kb.join(ka.select("url", "triple_key"), ["url", "triple_key"], "left_anti")
    return only_a, only_b

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
    """Append a deterministic string key encoding the full triple."""
    map_str = lambda c: F.concat_ws(  # noqa: E731
        ";",
        F.sort_array(F.transform(F.map_entries(c), lambda e: F.concat_ws("=", e.key, e.value))),
    )
    return df.withColumn(
        "triple_key",
        F.concat_ws(
            "||",
            F.col("subject_type"), F.col("subject"), F.col("predicate"),
            map_str(F.col("object_type")), map_str(F.col("object")),
        ),
    )


def micro_prf(pred: DataFrame, gold: DataFrame) -> dict[str, float]:
    p = canonical_triple_key(pred).select("url", "triple_key").dropDuplicates()
    g = canonical_triple_key(gold).select("url", "triple_key").dropDuplicates()
    correct = p.join(g, ["url", "triple_key"], "inner").count()
    pred_n = p.count()
    true_n = g.count()
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

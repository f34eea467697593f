"""Ensemble voting + KG filter (A2, R6, R7 — reference data/lic_2020.py:898-968).

The reference aligns k model-output files positionally with zip(*files); we
carry an explicit ``model_id`` column and join on (url, triple) instead, so
the vote is a single groupBy — shuffle on the triple key, map-side partial
aggregation for free, AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .eval import canonical_triple_key


def vote_and_kg_filter(
    model_outputs: DataFrame,
    kg_edges: DataFrame,
    min_votes: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """model_outputs: triples + model_id column. Returns (kept, rejected).

    Keep a triple iff it exists in the reference KG (check_spo_1,
    utils/kg.py:420-427) OR it appears in >= min_votes model outputs
    (data/lic_2020.py:921-935).
    """
    keyed = canonical_triple_key(model_outputs)
    votes = keyed.groupBy(
        "url", "triple_key", "subject_type", "subject", "predicate",
        "object_type", "object",
    ).agg(F.countDistinct("model_id").alias("votes"))

    # 3-key existence join: the KG side is distinct on (s, p, o) so each
    # voted triple matches at most one row — zero fan-out, no groupBy-max
    # re-aggregation (the old 2-key join replicated a triple once per KG
    # object of its (subject, predicate): 10⁵× on a hub pair).
    e = (
        kg_edges.select("subject", "predicate", F.col("object").alias("_obj"))
        .dropDuplicates()
        .withColumn("_in", F.lit(True))
    )
    flagged = (
        votes.withColumn("_obj", F.col("object")["@value"])
        .join(e, ["subject", "predicate", "_obj"], "left")
        .withColumn("in_kg", F.coalesce("_in", F.lit(False)))
    )
    keep_cond = F.col("in_kg") | (F.col("votes") >= min_votes)
    cols = ["url", "subject_type", "subject", "predicate", "object_type", "object"]
    kept = flagged.where(keep_cond).select(*cols)
    rejected = flagged.where(~keep_cond).select(*cols)
    return kept, rejected


def combine_results(
    main_result: DataFrame, voted_result: DataFrame
) -> DataFrame:
    """R7: union main-ensemble triples with the voted set, per-doc distinct
    (data/lic_2020.py:948-968). The reference then re-runs the combine/
    postprocess filter; callers chain combine_spos_df/postprocess as needed.
    """
    u = main_result.unionByName(voted_result)
    k = canonical_triple_key(u)
    return k.dropDuplicates(["url", "triple_key"]).drop("triple_key")

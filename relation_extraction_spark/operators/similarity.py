"""Approximate-nearest-neighbor search over embedding columns.

* brute-force cosine top-k — the exactness baseline: `F.zip_with` dot product
  + window rank, whole-stage codegen, no Python.
* LSH-bucketed ANN (random hyperplane signs) — the scale path: candidates
  share a signature bucket, exact cosine re-rank inside the bucket. The
  hyperplanes are deterministic (seeded hash of (plane, dim)), so results are
  cluster-size invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame, query: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for every query row (brute force).

    query: (query_id, vector). Broadcast the smaller side (queries);
    the scan side stays partition-parallel with codegen'd arithmetic.
    """
    q = F.broadcast(query.select(F.col("query_id"), F.col("vector").alias("_qv")))
    scored = (
        embeddings.select(id_col, vec_col)
        .crossJoin(q)
        .select(
            "query_id", id_col,
            F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplane_signature(vec_col, num_planes: int = 16):
    """Sign pattern of dot products with deterministic pseudo-random planes.

    plane[p][d] = crc32(p:d) scaled to [-1, 1]; the signature packs sign bits
    into a bigint. Pure Catalyst, identical on any cluster size.
    """
    def plane_component(p: int, d):
        return (F.crc32(F.concat(F.lit(str(p)), F.lit(":"), d.cast("string")))
                % F.lit(2001) - F.lit(1000)).cast("double") / F.lit(1000.0)

    def plane_dot(p: int):
        return F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, d: x * plane_component(p, d),
            ),
            F.lit(0.0), lambda acc, v: acc + v,
        )

    sig = F.lit(0).cast("bigint")
    for p in range(num_planes):
        sig = sig + F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("bigint")
    return sig


def ann_topk(
    embeddings: DataFrame, query: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 10, num_planes: int = 12,
) -> DataFrame:
    """LSH-bucketed ANN: join on hyperplane signature, exact cosine re-rank.

    Recall < 1 by design; at 100 TB this replaces the O(N·Q) scan with a
    bucket-equi join whose shuffle keys are uniform signature hashes.
    """
    e = embeddings.select(id_col, vec_col).withColumn(
        "sig", hyperplane_signature(F.col(vec_col), num_planes))
    q = query.select("query_id", F.col("vector")).withColumn(
        "sig", hyperplane_signature(F.col("vector"), num_planes))
    scored = (
        e.join(F.broadcast(q), "sig")
        .select("query_id", id_col,
                F.round(cosine(F.col(vec_col), F.col("vector")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, num_planes: int = 8,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold).

    Scale path (default): candidates share a hyperplane-LSH signature bucket,
    exact cosine re-rank inside buckets. ``exact=True`` compares all pairs —
    the oracle baseline for small candidate sets.
    """
    e = embeddings.select(id_col, vec_col)
    if exact:
        a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
        b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
        cand = a.crossJoin(b).where(F.col("a") < F.col("b"))
    else:
        sig = e.withColumn("sig", hyperplane_signature(F.col(vec_col), num_planes))
        a = sig.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "sig")
        b = sig.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "sig")
        cand = a.join(b, "sig").where(F.col("a") < F.col("b")).dropDuplicates(["a", "b"])
    return (
        cand.select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )

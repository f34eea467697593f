"""Round-7 evidence for the trained IVF codebook (round-6 verdict ask #2):
recall@10 and cell-balance, sampled vs Lloyd-trained coarse quantizer, at
two n_probe points.

Usage: python scripts/ivf_balance_probe.py [sf_dir] [n_queries]
Prints a small table; results recorded in BENCH/PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from relation_extraction_spark.operators.similarity import (  # noqa: E402
    _assign_cells,
    _init_centroids,
    cosine_topk,
    ivf_topk,
    train_ivf_centroids,
)
from relation_extraction_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="ivf-balance", master="local[8]")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    emb = emb.persist()
    n = emb.count()
    queries = emb.where(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("vector")).persist()

    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, queries, k=10).collect()}

    def cell_stats(cents):
        sizes = [r["n"] for r in _assign_cells(emb, "vec_id", "embedding",
                                               cents)
                 .groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()]
        mean = sum(sizes) / len(sizes)
        var = sum((s - mean) ** 2 for s in sizes) / len(sizes)
        return {"cells": len(sizes), "max": max(sizes), "min": min(sizes),
                "mean": round(mean, 1),
                "cv": round((var ** 0.5) / mean, 3)}

    print(f"n_vectors={n} n_queries={n_q} n_centroids=16")
    for label, rounds in (("sampled", 0), ("trained-2", 2)):
        cents = (train_ivf_centroids(emb, n_centroids=16, rounds=rounds)
                 if rounds else _init_centroids(emb, "vec_id", "embedding", 16))
        print(f"{label}: cell balance {cell_stats(cents)}")
        for n_probe in (2, 4):
            got = {(r["query_id"], r["vec_id"])
                   for r in ivf_topk(emb, queries, k=10, n_centroids=16,
                                     n_probe=n_probe,
                                     train_rounds=rounds).collect()}
            rec = len(got & exact) / len(exact)
            print(f"{label}: n_probe={n_probe} recall@10={rec:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()

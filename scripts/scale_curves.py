"""Round-5 scale evidence (round-4 VERDICT tasks 7 + 8).

A. **Decade curve** for the two slowest headline queries: run the exact
   bench shapes of ``paragraph_dedup`` and ``ngram_jaccard`` over corpora of
   5k / 50k / 500k documents (sf0.1 → "sf1.0" → one more decade) generated
   to match the testdata distribution (20-word vocabulary, 15-60 words per
   doc, 20 source blocks scaled with corpus size). Linearization claims
   hold iff time grows ~linearly in document count.

B. **ANN recall curve**: recall@10 of ``ann_topk`` vs the exact
   ``cosine_topk`` ground truth at 10× the embeddings fixture (20k vectors,
   32-dim, deterministic), for a grid of (bands, rows_per_band) — the
   OR-amplification dial's published operating points.

Corpora are written to parquet first and timed FROM parquet (repo rule:
never time through a chained generator stage). Run:

    PYTHONPATH=/root/repo python scripts/scale_curves.py [--sizes 5000,50000]

Results are printed as a markdown table to paste into BENCH/PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

from pyspark.sql import SparkSession, functions as F

VOCAB = ("spark sort value agg join filter merge group window batch fast big "
         "slow table stream data row key column part").split()


def gen_docs(spark: SparkSession, n: int, out_path: str) -> None:
    """Deterministic testdata-shaped corpus: word salad over a 20-word
    vocabulary (3-grams repeat across docs at the same rate as the
    fixture), n/25 source blocks of 250 docs each like sf0.1."""
    n_sources = max(n // 250, 1)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                nw = 15 + (i * 31 + 7) % 46
                words = [VOCAB[(i * 13 + k * (1 + i % 7)) % len(VOCAB)]
                         for k in range(nw)]
                texts.append(" ".join(words))
            yield pd.DataFrame({
                "doc_id": ids,
                "text": texts,
                "lang": ["en"] * len(ids),
                "source": [f"src{i % n_sources}" for i in ids],
                "n_chars": [len(t) for t in texts],
            })

    (spark.range(n, numPartitions=32)
     .mapInPandas(gen, "doc_id long, text string, lang string, source string, n_chars long")
     .write.mode("overwrite").parquet(out_path))


def time_query(fn, *args) -> tuple[float, int]:
    t0 = time.monotonic()
    n = fn(*args).count()
    return time.monotonic() - t0, n


def bench_shape_paragraph_dedup(spark, path):
    from relation_extraction_spark.operators.curation import paragraph_dedup

    d = spark.read.parquet(path)
    words = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    n_chunks = F.ceil(F.size(words) / 4).cast("int")
    chunked = d.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(" ", F.slice(words, (i - 1) * 4 + 1, 4)),
            ),
            "\n",
        ).alias("text"))
    return paragraph_dedup(chunked)


def bench_shape_ngram_jaccard(spark, path):
    from relation_extraction_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        spark.read.parquet(path), shingle_n=3, threshold=0.2,
        block_col="source", max_df=50)


def ngram_breakdown(spark, path, max_df: int = 50) -> list[tuple[str, float, int]]:
    """Stage-level attribution for ngram_jaccard_pairs' superlinear constant
    (round-5 verdict task #4): times CUMULATIVE sub-plans of the exact
    operator pipeline (mirrors dedup.py ngram_jaccard_pairs, max_df path,
    WITHOUT the persist so each stage attributes honestly); successive
    differences attribute cost per stage. Returns (label, secs, rows)."""
    from relation_extraction_spark.operators.dedup import word_shingles

    docs = spark.read.parquet(path)
    t = docs.select(
        "doc_id", "source",
        word_shingles(F.col("text"), 3).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    on = ["source", "shingle"]
    inv = t.select("doc_id", "n_sh", "source", F.explode("sh").alias("shingle"))
    keep = (inv.groupBy(*on).agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df).select(*on))
    inv2 = inv.join(keep, on, "left_semi")
    posting = (inv2.groupBy(*on)
               .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ids"))
               .where(F.size("ids") >= 2))
    pair_struct = F.flatten(F.transform(
        "ids",
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
            lambda y: F.struct(x["doc_id"].alias("a"), y["doc_id"].alias("b"),
                               x["n_sh"].alias("n_a"), y["n_sh"].alias("n_b")))))
    common = (posting.select(F.explode(pair_struct).alias("p"))
              .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                       F.col("p.n_a").alias("n_a"), F.col("p.n_b").alias("n_b"))
              .agg(F.count(F.lit(1)).alias("common")))
    full = (common.withColumn("jaccard", F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4))
            .where(F.col("jaccard") >= 0.2).select("a", "b", "jaccard"))
    out = []
    for label, df in [("shingle", t), ("explode", inv), ("df_keep", keep),
                      ("semi_join", inv2), ("posting_agg", posting),
                      ("pair_explode+agg", common), ("full", full)]:
        secs, rows = time_query(lambda: df)
        out.append((label, secs, rows))
    return out


def gen_vectors(spark: SparkSession, n: int, dim: int = 32):
    """Deterministic embedding table: splitmix64-hashed i.i.d.-uniform
    floats in [-1, 1] per (id, dim) — no lattice structure (a linear-
    congruential recipe makes all vectors translates of one another and
    every LSH config trivially reaches recall 1.0)."""
    import numpy as np

    M = (1 << 64) - 1

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            cols = []
            for d in range(dim):
                x = (ids * np.uint64(0x9E3779B97F4A7C15)
                     + np.uint64(d * 0xBF58476D1CE4E5B9 & M)) & np.uint64(M)
                x ^= x >> np.uint64(30)
                x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(M)
                x ^= x >> np.uint64(27)
                x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(M)
                x ^= x >> np.uint64(31)
                cols.append(x.astype(np.float64) / 2**63 - 1.0)
            mat = np.stack(cols, axis=1)
            yield pd.DataFrame({"vec_id": ids.astype(np.int64),
                                "embedding": list(mat)})

    return spark.range(n, numPartitions=32).mapInPandas(
        gen, "vec_id long, embedding array<double>")


def main() -> None:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--ann-n", type=int, default=20000)
    ap.add_argument("--ann-queries", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override cpus*2 (fixed-partition-count hypothesis)")
    ap.add_argument("--ngram-breakdown", action="store_true",
                    help="per-size stage attribution for ngram_jaccard")
    ap.add_argument("--only-ngram", action="store_true",
                    help="skip paragraph_dedup and the ANN section")
    ap.add_argument("--data-dir", default=None,
                    help="persistent corpus dir: reuse docs_<n> parquet "
                         "across invocations (A/B different session confs "
                         "on the identical corpus without regenerating)")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions or args.cpus * 2))
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if args.data_dir:
        os.makedirs(args.data_dir, exist_ok=True)
        tmp = args.data_dir
    else:
        tmp = tempfile.mkdtemp(prefix="scale_curves_")

    # warm every worker + JIT both query shapes before any timed run
    # (repo rule: contended/cold JVMs fake regressions)
    warm = f"{tmp}/warm"
    if not os.path.exists(f"{warm}/_SUCCESS"):
        gen_docs(spark, 1000, warm)
    bench_shape_paragraph_dedup(spark, warm).count()
    bench_shape_ngram_jaccard(spark, warm).count()

    print(f"## A. decade curve (local[{args.cpus}], timed from parquet)")
    print("| docs | paragraph_dedup s | rows | ngram_jaccard s | pairs |")
    print("|---|---|---|---|---|")
    prev = None
    for n in sizes:
        path = f"{tmp}/docs_{n}"
        if not os.path.exists(f"{path}/_SUCCESS"):
            gen_docs(spark, n, path)
        spark.read.parquet(path).count()  # warm FS cache / commit check
        if args.only_ngram:
            tp, rp = 0.0, 0
        else:
            tp, rp = time_query(bench_shape_paragraph_dedup, spark, path)
        tj, rj = time_query(bench_shape_ngram_jaccard, spark, path)
        ratio = ""
        if prev:
            ratio = (f"  (×{n / prev[0]:.0f} data → "
                     f"×{(tp / prev[1]) if prev[1] else float('nan'):.1f} / "
                     f"×{tj / prev[2]:.1f} time)")
        print(f"| {n} | {tp:.1f} | {rp} | {tj:.1f} | {rj} |{ratio}",
              flush=True)
        prev = (n, tp, tj)
        if args.ngram_breakdown:
            print(f"### ngram stage attribution at {n} docs "
                  f"(cumulative sub-plans, no persist)")
            print("| stage | cumulative s | rows |")
            print("|---|---|---|")
            for label, secs, rows in ngram_breakdown(spark, path):
                print(f"| {label} | {secs:.1f} | {rows} |", flush=True)

    if args.only_ngram:
        spark.stop()
        return

    print(f"\n## B. ANN recall@10 at {args.ann_n} vectors, "
          f"{args.ann_queries} queries")
    from relation_extraction_spark.operators.similarity import ann_topk, cosine_topk

    emb = gen_vectors(spark, args.ann_n)
    emb.write.mode("overwrite").parquet(f"{tmp}/emb")
    emb = spark.read.parquet(f"{tmp}/emb")
    q = (emb.where(F.col("vec_id") % (args.ann_n // args.ann_queries) == 17)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("vector")))
    truth = {}
    for r in cosine_topk(emb, q, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    print("| bands | rows_per_band | recall@10 | seconds |")
    print("|---|---|---|---|")
    for bands, rpb in [(2, 4), (4, 8), (8, 8), (4, 16), (8, 16), (16, 8),
                       (16, 4)]:
        t0 = time.monotonic()
        got = {}
        for r in ann_topk(emb, q, k=10, bands=bands,
                          rows_per_band=rpb).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        secs = time.monotonic() - t0
        rec = sum(len(got.get(k, set()) & v) for k, v in truth.items()) \
            / sum(len(v) for v in truth.values())
        print(f"| {bands} | {rpb} | {rec:.3f} | {secs:.1f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

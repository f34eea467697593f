"""Incremental-KG fold soak (round 6): cost of folding re-crawl batches
into a growing standing table via the EXACT streaming body
(``stream.fold_triples_batch`` — provenance → merge_delta → catalog
commit), measuring per-fold wall time as the table grows.

Expectation to verify: per-fold cost is O(|standing table| + |batch|) —
the fold is a copy-on-write table rewrite like an Iceberg MERGE, so it
grows linearly with the table, NOT with total history, and the constant
stays flat (no superlinear blowup from the adjudication pass).

Assertions are deterministic column expressions (no Python row path):
batch b emits ``--rows`` assertions over ``--entities`` subjects; 国籍
rows alternate their object with batch parity, so every functional key
conflicts across batches and the adjudication pass runs at full width
each fold.

Usage:
    PYTHONPATH=/root/repo python scripts/soak_kg_delta.py \
        [--batches 5] [--rows 4000000] [--entities 1000000] [--cpus 16]
"""

from __future__ import annotations

import argparse
import shutil
import tempfile
import time

from pyspark.sql import SparkSession, functions as F


def gen_batch(spark: SparkSession, b: int, rows: int, entities: int):
    x = F.col("id")
    pred = F.element_at(
        F.array(F.lit("国籍"), F.lit("主演"), F.lit("作者")),
        (x % 3 + 1).cast("int"))
    obj = F.when(
        x % 3 == 0, F.concat(F.lit("c"), F.lit(b % 2).cast("string"))
    ).otherwise(F.concat(F.lit("o"), ((x * 7) % 50).cast("string")))
    return spark.range(rows, numPartitions=32).select(
        F.concat(F.lit("e"), (x % entities).cast("string")).alias("subject"),
        pred.alias("predicate"),
        obj.alias("object"),
        F.concat(F.lit("https://s"), (x % 9973).cast("string"),
                 F.lit(".example/p"), ((x * 31) % 1000).cast("string"),
                 F.lit("b"), F.lit(b).cast("string")).alias("url"),
        (F.lit(b) * 1000 + x % 1000).cast("bigint").alias("ts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from relation_extraction_spark.streaming.stream import fold_triples_batch

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .appName("soak-kg-delta").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="kg_soak_")
    try:
        print(f"## kg_delta fold soak: {args.batches} batches × "
              f"{args.rows:,} assertions, {args.entities:,} entities, "
              f"local[{args.cpus}]")
        print("| fold | secs | standing edges | retracted |")
        print("|---|---|---|---|")
        for b in range(args.batches):
            batch = gen_batch(spark, b, args.rows, args.entities)
            t0 = time.monotonic()
            assert fold_triples_batch(batch, b, root)
            secs = time.monotonic() - t0
            from relation_extraction_spark.plans.catalog import Catalog

            cur = Catalog(spark, root).read("kg_edges")
            n = cur.count()
            n_ret = cur.where(F.col("status") == "retracted").count()
            print(f"| {b} | {secs:.1f} | {n:,} | {n_ret:,} |", flush=True)
        # additive-evidence invariant: total n_refs equals the sum of
        # per-batch distinct (s,p,o,url) assertions
        total_refs = cur.agg(F.sum("n_refs")).first()[0]
        expect = sum(
            gen_batch(spark, b, args.rows, args.entities)
            .dropDuplicates(["subject", "predicate", "object", "url"]).count()
            for b in range(args.batches))
        print(f"sum(n_refs) = {total_refs:,}  expected = {expect:,}  "
              f"{'OK' if total_refs == expect else 'MISMATCH'}")
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Round-7 evidence for merge-on-read KG folds (round-6 verdict ask #4):
per-fold wall time, copy-on-write vs delta-log, while the standing table
is ~10x the batch size and keeps growing.

Each fold ingests BATCH distinct new edges (plus re-assertions of a hot
functional key so adjudication runs). The copy-on-write path rewrites the
full table per fold (cost grows with |table|); the merge-on-read path
writes only the delta (cost ~flat in |batch|), paying the table-sized
cost only at the periodic compaction.

Usage: python scripts/kg_mor_soak.py [base_edges] [batch_edges] [folds]
Results recorded in BENCH/PLANS.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from relation_extraction_spark.session import get_spark  # noqa: E402
from relation_extraction_spark.streaming.stream import (  # noqa: E402
    fold_triples_batch,
    fold_triples_batch_mor,
    read_merged_table,
)


def triples(spark, n: int, offset: int, batch: int):
    """n raw assertions: 90% unique new edges, 10% re-asserting a rolling
    window of functional keys (adjudication work on every fold)."""
    base = spark.range(n).select((F.col("id") + offset).alias("i"))
    return base.select(
        F.concat(F.lit("https://s"), (F.col("i") % 50000).cast("string"),
                 F.lit(".example/p"), F.col("i").cast("string")).alias("url"),
        F.concat(F.lit("e"), F.when(F.col("i") % 10 == 0,
                                    (F.col("i") % 997).cast("string"))
                 .otherwise(F.col("i").cast("string"))).alias("subject"),
        F.when(F.col("i") % 10 == 0, F.lit("国籍"))
        .otherwise(F.lit("主演")).alias("predicate"),
        F.concat(F.lit("o"), (F.col("i") % 7).cast("string")).alias("object"),
        (F.lit(batch * 1000) + F.col("i") % 1000).cast("bigint").alias("ts"),
    )


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    folds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark(app_name="kg-mor-soak", master="local[8]",
                      shuffle_partitions=16)
    tmp = tempfile.mkdtemp(prefix="kg_mor_soak_")
    mor_root, cow_root = f"{tmp}/mor", f"{tmp}/cow"

    print(f"base={base_n} batch={batch_n} folds={folds}")
    b0 = triples(spark, base_n, 0, 0).persist()
    b0.count()
    for name, fold in (("cow", lambda df, i: fold_triples_batch(
            df, i, cow_root)),
                       ("mor", lambda df, i: fold_triples_batch_mor(
                           df, i, mor_root, compact_every=folds + 1))):
        t0 = time.time()
        fold(b0, 0)
        print(f"{name} fold0 (base load {base_n}): {time.time() - t0:.1f}s")
    b0.unpersist()

    for i in range(1, folds + 1):
        b = triples(spark, batch_n, base_n + i * batch_n, i).persist()
        b.count()
        row = {"fold": i}
        for name, fold in (("cow", lambda df, j: fold_triples_batch(
                df, j, cow_root)),
                           ("mor", lambda df, j: fold_triples_batch_mor(
                               df, j, mor_root, compact_every=folds + 1))):
            t0 = time.time()
            fold(b, i)
            row[name] = round(time.time() - t0, 2)
        b.unpersist()
        print(row)

    # one compaction at the end + read-path equivalence spot check
    from relation_extraction_spark.plans.catalog import Catalog
    from relation_extraction_spark.streaming.stream import compact_table

    t0 = time.time()
    mor_df = read_merged_table(spark, mor_root)
    n_mor = mor_df.count()
    t_read = time.time() - t0
    t0 = time.time()
    compact_table(spark, mor_root)
    t_compact = time.time() - t0
    n_cow = Catalog(spark, cow_root).read("kg_edges").count()
    n_after = read_merged_table(spark, mor_root).count()
    print(f"read_merged({folds} pending deltas): {t_read:.1f}s rows={n_mor}")
    print(f"compact: {t_compact:.1f}s  rows cow={n_cow} mor={n_after} "
          f"equal={n_cow == n_mor == n_after}")
    spark.stop()


if __name__ == "__main__":
    main()

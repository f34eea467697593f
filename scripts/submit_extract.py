"""spark-submit job: synthetic corpus → fused SPO extraction → parquet.

Run (the north-rule deployment shape):

    python scripts/package_pyfiles.py /tmp/rex_pyfiles.zip
    spark-submit --master local[8] --py-files /tmp/rex_pyfiles.zip \
        scripts/submit_extract.py --docs 2000 --out /tmp/rex_submit_out

On a real cluster, swap --master for the cluster manager and point --docs
at the Iceberg/parquet documents table; the package arrives on executors
via the zip, no install step.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="2000",
                    help="int → synthetic corpus of N docs, else a parquet path")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("rex-submit-extract").getOrCreate()
    # imported AFTER the session exists: proves the --py-files zip resolves
    from relation_extraction_spark.operators.extract_triples import extract_triples
    from relation_extraction_spark.synthetic import documents_df_distributed

    if args.docs.isdigit():
        docs = documents_df_distributed(spark, int(args.docs), partitions=8)
    else:
        docs = spark.read.parquet(args.docs)
    triples = extract_triples(docs)
    triples.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"triples_written": n, "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()

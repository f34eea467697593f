"""spark-submit entry point for the staged KG pipeline (north_rule: runnable
via ``spark-submit --py-files``).

Package the library and submit:

    cd /root/repo && zip -qr /tmp/re_spark.zip relation_extraction_spark
    spark-submit --py-files /tmp/re_spark.zip scripts/run_pipeline.py \
        --docs <parquet_dir_or_synthetic:N> --out /tmp/kg_run [--resume]

On a cluster, add --master/--num-executors etc.; the code contains no
local-mode assumptions (all parallelism comes from input splits and shuffle
partitions).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="parquet dir of documents, or 'synthetic:N'")
    ap.add_argument("--out", required=True, help="catalog root for stage tables")
    ap.add_argument("--resume", action="store_true", default=False)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--curate", action="store_true", default=False,
                    help="insert the committed curation stage (dedup + gates "
                         "+ PII redaction) before extraction; gates run "
                         "permissive here because the synthetic corpus is CJK")
    args = ap.parse_args()

    from relation_extraction_spark.plans.pipeline import KGPipeline
    from relation_extraction_spark.session import get_spark

    spark = get_spark(app_name="kg-pipeline",
                      shuffle_partitions=args.shuffle_partitions)
    if args.docs.startswith("synthetic:"):
        from relation_extraction_spark.synthetic import documents_df_distributed

        docs = documents_df_distributed(spark, int(args.docs.split(":", 1)[1]))
    else:
        docs = spark.read.parquet(args.docs)

    t0 = time.time()
    pipe = KGPipeline(spark, args.out)
    curate_opts = {"min_quality": 0.0, "max_dup_word_frac": 1.0,
                   "max_top_gram_frac": 1.0} if args.curate else None
    out = pipe.run(docs, resume=args.resume, curate=args.curate,
                   curate_opts=curate_opts)
    stats = {name: df.count() for name, df in out.items()}
    stats["stage_seconds"] = pipe.stage_seconds
    stats["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()

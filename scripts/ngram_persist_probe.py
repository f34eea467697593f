"""Round-6 verdict task #4: isolate the ngram_jaccard decade-curve
superlinearity (×10 docs → ×12-15 time, 500k→5M, while every cumulative
sub-plan WITHOUT the operator's persist/localCheckpoint scales ×9-11.5).

Hypothesis: the operator's internal ``persist(MEMORY_AND_DISK)`` of the
shingle table (and the eager ``localCheckpoint`` of the result) crosses
the executor-storage cliff at 5M docs — the extra constant is
serialization + disk spill I/O, not the dataflow.

Design: alternating fresh-JVM trials on the SAME pre-materialized parquet
corpus, idle box:

  A  stock ``ngram_jaccard_pairs`` (persist + eager localCheckpoint),
     with RDD storage info dumped after the count — mem vs disk bytes
     show whether the cache spilled;
  B  identical call with ``DataFrame.persist`` and
     ``DataFrame.localCheckpoint`` monkeypatched to identity — pure
     recompute dataflow.

Usage:
    PYTHONPATH=/root/repo python scripts/ngram_persist_probe.py \
        --path /tmp/sc_data/docs_5000000 [--trials 2] [--cpus 16]

Prints one markdown row per trial plus the storage-info dump; paste into
BENCH/PLANS.md.
"""

from __future__ import annotations

import argparse
import subprocess
import sys

WORKER = """
import sys, time
path, variant, cpus = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession, DataFrame, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .appName(f"ngram-probe-{variant}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
if variant == "nopersist":
    DataFrame.persist = lambda self, *a, **k: self
    DataFrame.unpersist = lambda self, *a, **k: self
    DataFrame.localCheckpoint = lambda self, *a, **k: self
from relation_extraction_spark.operators.dedup import ngram_jaccard_pairs
docs = spark.read.parquet(path)
docs.limit(1000).count()  # warm executors + parquet footer cache
t0 = time.monotonic()
n = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2,
                        block_col="source", max_df=50).count()
secs = time.monotonic() - t0
print(f"RESULT | {variant} | {secs:.1f} | {n} |", flush=True)
if variant == "stock":
    for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        print(f"STORAGE | {info.name()} | mem={info.memSize()/2**20:.0f}MB"
              f" | disk={info.diskSize()/2**20:.0f}MB"
              f" | {info.numCachedPartitions()}/{info.numPartitions()} parts",
              flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    print("| trial | variant | secs | pairs |")
    print("|---|---|---|---|")
    for trial in range(args.trials):
        for variant in ("stock", "nopersist"):
            out = subprocess.run(
                [sys.executable, "-c", WORKER, args.path, variant,
                 str(args.cpus)],
                capture_output=True, text=True, check=False)
            for line in out.stdout.splitlines():
                if line.startswith("RESULT"):
                    print(f"| {trial} {line[6:]}")
                elif line.startswith("STORAGE"):
                    print(line)
            if out.returncode != 0:
                print(out.stderr[-2000:])
                sys.exit(1)


if __name__ == "__main__":
    main()

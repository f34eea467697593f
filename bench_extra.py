"""Round-8 optimization harness (guide §1): time individual declared queries
with the noop sink at any SF, and dump .explain("formatted") plans to
plans/r08/. Does NOT touch bench.py (frozen for measurement).

Usage:
    python bench_extra.py [--sf DIR] [--trials N] [--plans SUFFIX] q1 q2 ...
    python bench_extra.py --all          # the 25 headline bench queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pipeline_extract", "tpch_q1", "tpch_q3", "a2_vote", "a7_adjacency",
    "w1w2_nearest_marks", "j10_nearest_pair", "minhash_buckets", "simhash",
    "ngram_jaccard", "cosine_topk", "dedup_exact", "quality", "fingerprint",
    "data_pipeline", "ivf_topk", "budget_sample_hash",
    "repetition", "pii_redact", "paragraph_dedup", "decontaminate",
    "latest_events", "kg_pagerank", "html_extract", "kg_merge",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    trials = 3
    plans_suffix = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--trials":
            trials = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_suffix = args[i + 1]; i += 2
        elif a == "--all":
            names = list(HEADLINE); i += 1
        else:
            names.append(a); i += 1

    import __spark_entry__ as em
    from relation_extraction_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = em.queries()
    out: dict[str, dict] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        if plans_suffix is not None:
            os.makedirs("plans/r08", exist_ok=True)
            with open(f"plans/r08/{name}_{plans_suffix}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        ts = []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(f"r08 {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        ts_sorted = sorted(ts)
        out[name] = {"median": ts_sorted[len(ts_sorted) // 2], "all": ts}
        print(f"{name}: median={out[name]['median']} all={ts}", flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "trials": trials,
                      "queries": {k: v["median"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()

"""Interleaved A/B benchmark: round-4 code (bf70cc5) vs current HEAD.

Round-5 verdict: the driver's BENCH_r05 showed 5 queries regressed 15-26%
vs BENCH_r04 (ngram_jaccard, pii_redact, simhash, repetition,
decontaminate) and the scaling-leg throughput down 15%, while none of
their code changed between rounds — the builder's idle-box re-run showed
r4 parity, suggesting machine contention in the driver run. Narrative is
not evidence; this harness settles it with a controlled experiment:

- both variants run from git worktrees of THIS clone (same interpreter,
  same /root/testdata sf0.1 parquet, same pre-materialized 1M-doc corpus);
- strict interleaving A,B,A,B,... (3 sessions per variant per phase), so
  slow machine drift hits both variants equally;
- each session is a fresh JVM; each query gets one untimed warm run (full
  python-worker pool + JIT + page cache) then one timed run;
- scaling phase measures the fused-extraction leg at local[4] and
  local[16] per session, exactly like bench.py's N->4N evidence.

Usage:
    python scripts/ab_bench.py            # orchestrate, write BENCH/ab_r6.json
    python scripts/ab_bench.py --worker queries <out.json>   # internal
    python scripts/ab_bench.py --worker scaling <out.json> <docs_path> <n>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

QUERIES = ["ngram_jaccard", "pii_redact", "simhash", "repetition", "decontaminate"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DOCS = int(os.environ.get("AB_SCALE_DOCS", "1000000"))
SESSIONS = int(os.environ.get("AB_SESSIONS", "3"))
R4_REF = "bf70cc5"


# ----------------------------------------------------------- worker side --
def worker_queries(out_path: str) -> None:
    from relation_extraction_spark.session import get_spark

    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as em

    spark = get_spark(app_name="ab-queries", master="local[32]",
                      shuffle_partitions=32)
    qs = em.queries()
    for name in QUERIES:  # warm: worker pool, JIT, parquet page cache
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    res = {}
    for name in QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        res[name] = round(time.time() - t0, 3)
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(res, fh)


def worker_scaling(out_path: str, docs_path: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from relation_extraction_spark.operators.extract_triples import extract_triples
    from relation_extraction_spark.session import get_spark

    res = {}
    for cpus in (4, 16):
        spark = get_spark(app_name=f"ab-extract-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
        try:
            docs = spark.read.parquet(docs_path)
            extract_triples(docs.where(F.crc32("url") % 50 == 0)).count()  # warm
            t0 = time.time()
            n_triples = extract_triples(docs).count()
            dt = time.time() - t0
        finally:
            spark.stop()
        res[str(cpus)] = {"seconds": round(dt, 3),
                          "tps": round(n_triples / dt, 1),
                          "triples": n_triples}
    with open(out_path, "w") as fh:
        json.dump(res, fh)


# ----------------------------------------------------- orchestrator side --
def _run_worker(repo: str, mode: str, out: str, extra: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_SF_DIR=SF_DIR)
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "ab_bench.py"),
         "--worker", mode, out, *extra],
        cwd=repo, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as fh:
        return json.load(fh)


def _median(xs):
    return round(statistics.median(xs), 3)


def main() -> None:
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r4 = "/tmp/ab_r4_tree"
    if not os.path.exists(os.path.join(r4, "bench.py")):
        subprocess.run(["git", "worktree", "add", "--detach", r4, R4_REF],
                       cwd=head, check=True)
        # the r4 tree needs THIS harness (it post-dates r4); worktree files
        # outside /root/repo are scratch, removed by `git worktree remove`
        os.makedirs(os.path.join(r4, "scripts"), exist_ok=True)
        with open(os.path.join(head, "scripts", "ab_bench.py")) as fh:
            src = fh.read()
        with open(os.path.join(r4, "scripts", "ab_bench.py"), "w") as fh:
            fh.write(src)

    # shared input corpus (synthetic.py is IDENTICAL bf70cc5..HEAD — verified
    # via git diff — so one parquet serves both variants)
    sys.path.insert(0, head)
    from bench import materialize_corpus
    docs_path = materialize_corpus(SCALE_DOCS)

    variants = {"r4": r4, "head": head}
    out = {"queries": {v: [] for v in variants},
           "scaling": {v: [] for v in variants}}
    tmp = "/tmp/ab_worker_out.json"

    for phase, mode, extra in (
        ("queries", "queries", []),
        ("scaling", "scaling", [docs_path, str(SCALE_DOCS)]),
    ):
        for sess in range(SESSIONS):
            for vname, vrepo in variants.items():  # strict A,B interleave
                t0 = time.time()
                res = _run_worker(vrepo, mode, tmp, extra)
                out[phase][vname].append(res)
                print(f"[{phase} s{sess}] {vname}: {json.dumps(res)} "
                      f"({round(time.time() - t0, 1)}s)", flush=True)

    # summarize: per-query medians + scaling medians/efficiency per variant
    summary: dict = {"queries": {}, "scaling": {}}
    for q in QUERIES:
        summary["queries"][q] = {
            v: _median([s[q] for s in out["queries"][v]]) for v in variants}
    for v in variants:
        lo = _median([s["4"]["tps"] for s in out["scaling"][v]])
        hi = _median([s["16"]["tps"] for s in out["scaling"][v]])
        summary["scaling"][v] = {
            "tps_4": lo, "tps_16": hi, "efficiency": round((hi / lo) / 4, 3)}
    result = {"design": f"interleaved A/B, {SESSIONS} fresh-JVM sessions per "
                        f"variant per phase, warm-then-timed, sf_dir={SF_DIR}, "
                        f"scale_docs={SCALE_DOCS}, r4={R4_REF}",
              "summary": summary, "raw": out}
    dst = os.path.join(head, "BENCH", "ab_r6.json")
    with open(dst, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(summary, indent=1))
    print(f"written: {dst}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        mode, out = sys.argv[2], sys.argv[3]
        if mode == "queries":
            worker_queries(out)
        else:
            worker_scaling(out, sys.argv[4], int(sys.argv[5]))
    else:
        main()

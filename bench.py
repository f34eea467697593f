"""Headline benchmark: runs the flagship extraction pipeline + representative
relational/dedup/similarity queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Also measures the two-parallelism-level scaling evidence required by the
north_rule (sandbox stand-in for N vs 4N executors): the same fused
extraction job at local[N/4] and local[N] over identical input, reporting
docs/sec + triples/sec at both and the scaling efficiency
eff = (tps_high / tps_low) / (cpus_high / cpus_low).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "1000000"))
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "3"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"


def _sf(sf_dir: str) -> float:
    for part in sf_dir.rstrip("/").split("/"):
        if part.startswith("sf"):
            try:
                return float(part[2:])
            except ValueError:
                pass
    return -1.0


QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "3"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s)
    return s[m // 2] if m % 2 else round((s[m // 2 - 1] + s[m // 2]) / 2, 3)


def _spin_probe() -> float:
    """Contention sentinel (round-6 verdict ask #7): a fixed
    single-threaded pure-python spin whose wall time is a direct read of
    how much CPU this process actually gets. Run at bench start AND end;
    a leftover probe JVM or parallel test session inflates it the same
    way it inflates every query (rounds 5 and 6 both lost a day of
    adjudication to exactly that). Threshold documented in
    BENCH/BASELINE.md: spread (max/min across probes) > 1.2 → the run is
    flagged ``contended`` and its absolute timings should not be read as
    regressions."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    assert acc  # keep the loop un-optimizable
    return round(time.perf_counter() - t0, 3)


def run_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, list], dict[str, int]]:
    """Per-query repeat-median (QUERY_TRIALS runs each): one loaded-machine
    outlier can no longer masquerade as a regression — the median is the
    headline number, all trials are reported for dispersion.

    Timing action = a noop-sink write, NOT count(): count() lets Catalyst
    prune every computed column out of a projection query's plan, timing
    little more than the scan (a pruned count() once hid a 60 ms/doc
    expression cost entirely). Row counts are taken separately, untimed."""
    import __spark_entry__ as em

    names = [
        "pipeline_extract", "tpch_q1", "tpch_q3", "a2_vote", "a7_adjacency",
        "w1w2_nearest_marks", "j10_nearest_pair", "minhash_buckets", "simhash",
        "ngram_jaccard", "cosine_topk", "dedup_exact", "quality", "fingerprint",
        "data_pipeline", "ivf_topk", "budget_sample_hash",
        "repetition", "pii_redact", "paragraph_dedup", "decontaminate",
        "latest_events", "kg_pagerank",
        # round-6 additions: the html front door and the incremental KG fold
        "html_extract", "kg_merge",
    ]
    qs = em.queries()
    med: dict[str, float] = {}
    trials: dict[str, list] = {}
    rows: dict[str, int] = {}
    for name in names:
        ts = []
        for _ in range(QUERY_TRIALS):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        med[name] = _median(ts)
        trials[name] = ts
        rows[name] = qs[name](spark, sf_dir).count()
    return med, trials, rows


def materialize_corpus(n_docs: int, partitions: int = 128) -> str:
    """Write the deterministic corpus to parquet once (NOT part of the timed
    extraction — on a real cluster the WARC table already exists)."""
    import tempfile

    from relation_extraction_spark.session import get_spark
    from relation_extraction_spark.synthetic import documents_df_distributed

    path = os.path.join(tempfile.gettempdir(), f"bench_docs_{n_docs}_{partitions}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(app_name="bench-gen", master=f"local[{CPUS}]")
        try:
            documents_df_distributed(spark, n_docs, partitions=partitions) \
                .write.mode("overwrite").parquet(path)
        finally:
            spark.stop()
    return path


def extraction_throughput(master_cpus: int, docs_path: str, n_docs: int) -> dict[str, float]:
    """Fused extraction throughput at one parallelism level."""
    from pyspark.sql import functions as F

    from relation_extraction_spark.operators.extract_triples import extract_triples
    from relation_extraction_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-extract-{master_cpus}",
        master=f"local[{master_cpus}]",
        shuffle_partitions=master_cpus,
    )
    try:
        docs = spark.read.parquet(docs_path)
        # warm-up touches EVERY partition (spins up the full python worker
        # pool + JIT) without doing the full work — excluded from timing
        extract_triples(docs.where(F.crc32("url") % 50 == 0)).count()
        t0 = time.time()
        n_triples = extract_triples(docs).count()
        dt = time.time() - t0
    finally:
        spark.stop()
    return {
        "cpus": master_cpus,
        "docs": n_docs,
        "seconds": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
        "triples": n_triples,
    }


def main() -> None:
    from relation_extraction_spark.session import get_spark

    t_total = time.time()
    _spin_probe()  # warm-up discard: the first spin runs ~1.6× slow on a
    # cold process (frequency ramp) and would false-flag an idle run
    probes = [_spin_probe(), _spin_probe()]
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    med, trials, rows = run_queries(spark, SF_DIR)
    spark.stop()

    # The printed line must stay compact (≤ ~1.5 KB): the driver captures a
    # bounded tail of stdout, and round 3's line (with per-query trial arrays
    # + row counts inlined) overflowed it → BENCH_r03 `parsed: null`. Medians
    # + scaling + headline tps go on the line; trials/rows/dispersion go to
    # BENCH/last_run.json.
    result = {
        "metric": "e2e_seconds_headline_queries",
        "unit": "sec",
        "sf": _sf(SF_DIR),
        "queries": med,
    }
    detail = {"query_trials": trials, "rows": rows}

    if RUN_SCALING:
        # N vs 4N within the machine's linear region (32 logical = 16 physical
        # cores here: past 16 the hardware itself stops scaling — see
        # BENCH/BASELINE.md control experiment). N=4 → 4N=16.
        high_cpus = min(CPUS, 16)
        low_cpus = max(high_cpus // 4, 1)
        path = materialize_corpus(SCALE_DOCS)
        # SYMMETRIC trials: same count at both levels, efficiency computed
        # from MEDIANS (best-of is also reported but never used for the
        # efficiency claim — asymmetric best-of inflated it in round 1).
        def run_level(cpus: int) -> dict:
            trials = [extraction_throughput(cpus, path, SCALE_DOCS)
                      for _ in range(SCALE_TRIALS)]
            tps = sorted(t["triples_per_sec"] for t in trials)
            rep = max(trials, key=lambda r: r["triples_per_sec"])
            return {**rep, "trials": len(trials),
                    "tps_median": round(_median(tps), 1),
                    "tps_best": rep["triples_per_sec"],
                    "tps_all": tps}

        low = run_level(low_cpus)
        high = run_level(high_cpus)
        eff = (high["tps_median"] / low["tps_median"]) / (high["cpus"] / low["cpus"])
        detail["scaling"] = {
            "low": low,
            "high": high,
            "efficiency_basis": f"median of {SCALE_TRIALS} symmetric trials per level",
        }
        result["scaling"] = {
            "low": {"cpus": low["cpus"], "tps_median": low["tps_median"]},
            "high": {"cpus": high["cpus"], "tps_median": high["tps_median"]},
            "docs": SCALE_DOCS,
            "efficiency": round(eff, 3),
        }
        result["triples_per_sec"] = high["tps_median"]

    probes.append(_spin_probe())  # end-of-run probe brackets the whole bench
    spread = round(max(probes) / min(probes), 3)
    result["probe"] = {"times": probes, "spread": spread}
    result["contended"] = spread > 1.2
    result["value"] = round(time.time() - t_total, 3)

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "last_run.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as fh:
        json.dump({**result, **detail}, fh, ensure_ascii=False, indent=1)

    line = json.dumps(result, ensure_ascii=False)
    assert len(line) <= 1500, f"bench line too long for driver capture: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()

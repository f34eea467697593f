"""Staged, checkpointed, resumable KG-construction pipeline (SURVEY.md §7).

Stage DAG (each stage = committed catalog table + per-partition lineage rows):

    documents → text → triples → edges+vertices → corrected → canonical_edges

The reference "checkpoints" by writing a JSONL file between every script
(SURVEY.md §3.3); here every stage commits a catalog table plus a lineage
table ``lineage_<stage>(stage, partition_id, url_min, url_max, row_count,
n_distinct_keys[, n_distinct_<col>...])`` — key range, row/doc counts and
per-stage decode stats (predicate diversity for the triples stage) —
so a rerun resumes from the last committed stage — at 10^12-document scale
that is the difference between losing a day and losing one stage.

Lineage rows are computed AFTER the commit from the committed table itself,
reading only the key column (parquet column pruning — the scan touches one
string column of the just-written files, not the stage's input or payload
columns), grouped by spark_partition_id of the read-back split. This is one
cheap extra pass by design: lineage must describe what was COMMITTED, and a
same-job accumulator would record pre-commit state that a partially-retried
write could contradict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract_triples import extract_text_df, extract_triples
from ..operators.kg import kg_correct, kg_edges, kg_vertices, self_check
from ..operators.linking import canonical_mapping, canonicalize_edges
from .catalog import Catalog


def lineage_rows(
    df: DataFrame, stage: str, key: str = "url",
    stat_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-partition lineage: key range + row count (every stage) plus decode
    stats (north_rule): ``n_distinct_keys`` (for the triples stage = number of
    documents that decoded to ≥1 triple; row_count / n_distinct_keys is the
    partition's triples-per-doc) and one distinct-count per ``stat_cols``
    entry (e.g. predicate diversity). The scan stays column-pruned to
    key + stat_cols of the committed files."""
    aggs = [
        F.min(key).alias("url_min"),
        F.max(key).alias("url_max"),
        F.count(F.lit(1)).alias("row_count"),
        F.countDistinct(key).alias("n_distinct_keys"),
    ]
    aggs += [F.countDistinct(c).alias(f"n_distinct_{c}") for c in stat_cols]
    return (
        df.select(key, *stat_cols)  # column-pruned lineage scan
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "*",
        )
        .drop("_pid")
    )


class KGPipeline:
    """Run stages with checkpoint/resume against a Catalog."""

    STAGES = ("documents", "triples", "edges", "vertices", "corrected", "canonical_edges")

    def __init__(self, spark: SparkSession, catalog_root: str, scorer=None,
                 signature_stop_max_df: int | None = None):
        self.spark = spark
        self.catalog = Catalog(spark, catalog_root)
        self.scorer = scorer
        # forwarded to canonical_mapping: cap on corpus-wide decoration
        # shingles in the LSH signatures (see linking.lsh_candidate_pairs) —
        # set on corpora whose entity names share honorific/suffix grams
        self.signature_stop_max_df = signature_stop_max_df
        self.stage_seconds: dict[str, float] = {}

    N_BUCKETS = 64

    def _checkpoint(self, name: str, df: DataFrame, key: str = "url",
                    bucket_by: str | None = None,
                    stat_cols: tuple[str, ...] = ()) -> DataFrame:
        if bucket_by is not None:
            # hash-bucketed layout: joins/groupBys on the bucket key read
            # co-located files and prune by bucket (poor man's Iceberg
            # bucket partitioning; swap for bucketed writeTo with real Iceberg)
            df = df.withColumn(
                "bucket", F.pmod(F.crc32(F.col(bucket_by)), F.lit(self.N_BUCKETS))
            ).repartition("bucket")
            self.catalog.write(name, df, partition_by=["bucket"])
        else:
            self.catalog.write(name, df)
        out = self.catalog.read(name)
        if key in out.columns:
            self.catalog.write(
                f"lineage_{name}",
                lineage_rows(out, name, key,
                             tuple(c for c in stat_cols if c in out.columns)))
        # 'bucket' is a physical-layout artifact (partition pruning already
        # happened at write time) — callers get the logical schema back
        return out.drop("bucket") if bucket_by is not None else out

    def _stage(self, name: str, compute, resume: bool, key: str = "url",
               bucket_by: str | None = None,
               stat_cols: tuple[str, ...] = ()) -> DataFrame:
        import time

        if resume and self.catalog.exists(name):
            self.stage_seconds[name] = 0.0
            out = self.catalog.read(name)
            return out.drop("bucket") if bucket_by is not None else out
        t0 = time.time()
        out = self._checkpoint(name, compute(), key, bucket_by, stat_cols)
        self.stage_seconds[name] = round(time.time() - t0, 2)
        return out

    def run(self, documents: DataFrame, resume: bool = True,
            curate: bool = False,
            curate_opts: dict | None = None) -> dict[str, DataFrame]:
        """``curate=True`` inserts a committed curation stage (exact +
        paragraph dedup, quality/repetition gates, PII redaction — see
        operators/curation.curate_docs) between text extraction and triple
        extraction. ``curate_opts`` forwards thresholds; the default gates
        are English-centric, so pass permissive ones for CJK corpora.

        Resume consistency (guarded in BOTH directions, plus an opts check):
        toggling ``curate`` against a catalog whose downstream stages are
        already committed — or resuming with *different* curate_opts than
        the ones the committed 'curated' table was built with (persisted in
        the 'curate_opts' sidecar table) — would silently serve stale
        triples, so each case raises instead."""
        import json

        opts_json = json.dumps(curate_opts or {}, sort_keys=True, default=str)
        if curate and resume and self.catalog.exists("triples") \
                and not self.catalog.exists("curated"):
            raise ValueError(
                "resume with curate=True over a catalog built WITHOUT a "
                "curated stage: the committed 'triples' table would bypass "
                "curation. Use a fresh catalog root or resume=False.")
        if not curate and resume and self.catalog.exists("curated"):
            raise ValueError(
                "resume with curate=False over a catalog built WITH a "
                "curated stage: the committed downstream tables were derived "
                "from curated text and would be served as if uncurated. "
                "Resume with curate=True, or rebuild with resume=False.")
        if curate and resume and self.catalog.exists("curated"):
            if not self.catalog.exists("curate_opts"):
                raise ValueError(
                    "resume with curate=True but the catalog has no "
                    "'curate_opts' sidecar to verify the committed curated "
                    "stage against (catalog predates opts tracking). "
                    "Rebuild with resume=False to record them.")
            committed = self.catalog.read("curate_opts").head()["opts"]
            if committed != opts_json:
                raise ValueError(
                    "resume with curate_opts different from the ones the "
                    "committed 'curated' stage was built with — the resumed "
                    f"output would be stale. committed={committed} "
                    f"requested={opts_json}. Use the committed opts, or "
                    "rebuild with resume=False.")
        if not resume:
            # a fresh rebuild invalidates the incremental cut IMMEDIATELY
            # (it is re-committed at the end) so "processed_urls exists" ⟺
            # "the base run completed" holds through any mid-run crash —
            # a stale cut would make run_incremental silently drop urls.
            # A stale curated table from an earlier curate=True run would
            # likewise keep blocking run_incremental forever.
            if self.catalog.exists("processed_urls"):
                self.catalog.drop("processed_urls")
            if not curate and self.catalog.exists("curated"):
                self.catalog.drop("curated")
            if not curate and self.catalog.exists("curate_opts"):
                self.catalog.drop("curate_opts")
        out: dict[str, DataFrame] = {}
        out["documents"] = self._stage(
            "documents", lambda: extract_text_df(documents), resume)
        extract_input = out["documents"]
        if curate:
            from ..operators.curation import curate_docs

            def curated():
                kept = curate_docs(out["documents"], id_col="url",
                                   **(curate_opts or {}))
                # restore the columns extraction consumes (lang); curated
                # text replaces the raw text
                return out["documents"].select("url", "lang").join(kept, "url")

            if not (resume and self.catalog.exists("curated")):
                # the stage is about to (re)compute: drop any STALE committed
                # curated table FIRST, then commit the opts sidecar, then
                # recompute. Ordering matters for crash safety — with the old
                # "sidecar first, keep stale table" order, a crash after the
                # sidecar write but before the curated commit left
                # sidecar=new-opts + curated=old-data, and a later
                # resume=True run with the new opts passed the opts guard
                # and silently served the stale curated triples. With the
                # drop up front, every crash window leaves the catalog
                # either without a curated table (→ recompute on resume) or
                # with a freshly-committed table matching the sidecar.
                if self.catalog.exists("curated"):
                    self.catalog.drop("curated")
                self.catalog.write("curate_opts", self.spark.createDataFrame(
                    [(opts_json,)], "opts string"))
            out["curated"] = self._stage("curated", curated, resume)
            extract_input = out["curated"]
        out["triples"] = self._stage(
            "triples", lambda: extract_triples(extract_input, scorer=self.scorer),
            resume, stat_cols=("predicate",))
        out["edges"] = self._stage(
            "edges", lambda: kg_edges(out["triples"]), resume, key="subject",
            bucket_by="subject")
        out["vertices"] = self._stage(
            "vertices", lambda: kg_vertices(out["triples"]), resume, key="entity")

        def corrected():
            t = out["triples"].join(
                out["documents"].select("url", "text"), "url", "left")
            return kg_correct(t, out["edges"], out["vertices"])

        out["corrected"] = self._stage("corrected", corrected, resume)

        def canonical():
            # edges (kg_edges dedup + self_check joins over ALL triples) and
            # entities feed FOUR downstream consumers (candidate generation,
            # CC entry, the mapping join, edge rewrite); materialize each
            # once — they are orders of magnitude smaller than the triple
            # table — instead of re-running the 1M-row dedup per consumer
            # kg_edges is checkpointed BEFORE self_check: self_check scans
            # its edges input twice (conflict-pair groupBy + final
            # anti-join), which would re-run the million-row dedup per scan
            raw_edges = kg_edges(out["corrected"]).localCheckpoint(eager=True)
            edges = self_check(raw_edges, out["vertices"]) \
                .localCheckpoint(eager=True)
            entities = edges.select(F.col("subject").alias("entity")).union(
                edges.select("object")).dropDuplicates().localCheckpoint(eager=True)
            mapping = canonical_mapping(
                entities, signature_stop_max_df=self.signature_stop_max_df)
            return canonicalize_edges(edges, mapping)

        out["canonical_edges"] = self._stage(
            "canonical_edges", canonical, resume, key="subject",
            bucket_by="subject")
        # the incremental cut (see run_incremental): these urls now have
        # documents AND triples committed
        self.catalog.write(
            "processed_urls", out["documents"].select("url").dropDuplicates())
        return out

    def run_incremental(self, new_documents: DataFrame) -> dict[str, DataFrame]:
        """Crawl-increment run: extract ONLY urls not already fully
        processed, append to the document and triple tables, then rebuild
        the KG stages. The rebuild is the cheap part by design: at any
        corpus size edges/vertices/canonicalization scale with the DISTINCT
        entity/edge set, not the document count (measured flat from
        500k → 5M docs, BENCH/BASELINE.md), while the expensive extraction
        touches only the increment.

        Crash safety via a CONSISTENT CUT: ``processed_urls`` is committed
        only AFTER both the merged documents and triples land. A retry
        after a crash anywhere mid-increment semi-joins the tables back to
        the cut (dropping any partial increment rows) and redoes the
        increment from scratch — no triples are ever silently lost and
        none are duplicated. A crash after the cut advances leaves only
        the KG stages stale, and any later run_incremental (even a no-op
        one) rebuilds them. First call on an empty catalog behaves exactly
        like ``run``. All joins key on url — uniform; nothing is collected.
        """
        if self.catalog.exists("curated"):
            raise ValueError(
                "run_incremental does not support curated catalogs yet: the "
                "increment would bypass the committed curation stage. Re-run "
                "the full pipeline with curate=True on the merged corpus.")
        if not self.catalog.exists("documents"):
            return self.run(new_documents, resume=False)
        if not self.catalog.exists("triples") \
                or not self.catalog.exists("processed_urls"):
            # the cut is committed LAST by both run() and run_incremental(),
            # so its presence certifies a fully completed base — a partially
            # crashed full rebuild must be finished stage-wise first
            raise ValueError(
                "base run incomplete (no committed processed_urls cut): "
                "finish it with run(resume=True) before applying increments.")
        processed = self.catalog.read("processed_urls")
        prev_docs = self.catalog.read("documents").join(processed, "url", "left_semi")
        prev_triples = self.catalog.read("triples").join(processed, "url", "left_semi")
        fresh = new_documents.join(processed, "url", "left_anti")
        # materialize once: consumed by the documents write, the extraction,
        # and the cut advance
        docs_inc = extract_text_df(fresh).localCheckpoint(eager=True)
        triples_inc = extract_triples(docs_inc, scorer=self.scorer)
        out: dict[str, DataFrame] = {}
        out["documents"] = self._stage(
            "documents", lambda: prev_docs.unionByName(docs_inc), False)
        out["triples"] = self._stage(
            "triples", lambda: prev_triples.unionByName(triples_inc), False,
            stat_cols=("predicate",))
        # advance the cut ONLY now that both commits exist
        self.catalog.write(
            "processed_urls",
            processed.unionByName(docs_inc.select("url")).dropDuplicates())
        # KG stages recompute over the merged triple table (entity-set
        # sized); resume=False because their committed versions describe
        # the pre-increment corpus
        out["edges"] = self._stage(
            "edges", lambda: kg_edges(out["triples"]), False, key="subject",
            bucket_by="subject")
        out["vertices"] = self._stage(
            "vertices", lambda: kg_vertices(out["triples"]), False, key="entity")

        def corrected():
            t = out["triples"].join(
                out["documents"].select("url", "text"), "url", "left")
            return kg_correct(t, out["edges"], out["vertices"])

        out["corrected"] = self._stage("corrected", corrected, False)

        def canonical():
            raw_edges = kg_edges(out["corrected"]).localCheckpoint(eager=True)
            edges = self_check(raw_edges, out["vertices"]) \
                .localCheckpoint(eager=True)
            entities = edges.select(F.col("subject").alias("entity")).union(
                edges.select("object")).dropDuplicates().localCheckpoint(eager=True)
            return canonicalize_edges(edges, canonical_mapping(
                entities, signature_stop_max_df=self.signature_stop_max_df))

        out["canonical_edges"] = self._stage(
            "canonical_edges", canonical, False, key="subject",
            bucket_by="subject")
        return out

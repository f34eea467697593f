"""relation_extraction_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the computational semantics of the 2020 LIC
relation-extraction pipeline (reference: BaberMuyu/relation-extraction, read-only
at /root/reference) as staged, checkpointable Spark DataFrame transforms over an
Iceberg-style table of Common-Crawl-style web pages
``documents(url, warc_ts, html, text, lang)``.

Architecture (Spark-first, NOT a port):

* all relational logic (filters, joins, aggregations, voting, KG correction,
  connected components) is plain DataFrame/SQL so Catalyst handles pushdown,
  pruning, broadcast selection and AQE;
* the only Python on the hot path is four Arrow-vectorized entry points
  (html→text extraction, tokenize+align, the fused score→decode→assemble
  kernel in ``mapInPandas``, and the grouped triple-recompose) — no per-row
  Python UDFs anywhere;
* every pipeline stage checkpoints to parquet (thin Iceberg-style catalog
  wrapper) with per-partition lineage rows so a run resumes mid-pipeline.
"""

__version__ = "0.1.0"

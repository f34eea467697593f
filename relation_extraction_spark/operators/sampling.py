"""Deterministic budget sampling — the pretraining-mixture operator: give
each group (language, source, domain) a token/char budget and keep a
reproducible subset of documents that fills it.

No reference counterpart (the reference samples nothing; SURVEY.md §2.1 S7 is
a plain limit) — this belongs to the task-brief training-data family. Two
variants trade exactness against scale:

* ``budget_sample_exact`` — rank documents inside each group by a uniform
  content hash and keep rows while the EXCLUSIVE running weight stays under
  the budget (so the first row crossing it is kept and every non-empty group
  emits at least one row). Exact and reproducible, but the per-group window
  sorts each group in a single task — safe while the biggest group fits one
  task (per-source quotas over up to a few tens of millions of rows per
  group); beyond that use the hash variant.
* ``budget_sample_hash`` — two passes, no sort: aggregate per-group total
  weight (map-side combinable), derive keep-fraction = budget/total, then
  filter map-side on a uniform [0,1) hash of the document id. Fully
  scale-safe (the only shuffle is the tiny per-group aggregate, broadcast
  back); the kept weight is budget ± sampling noise (binomial, ~1/√n
  relative), which is how web-scale mixture samplers actually run.

Both use md5-derived ranks/uniforms so the driver's DuckDB oracle can
reproduce them bit-for-bit (crc32/xxhash are not cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_SPACE = float(1 << 32)


def _uniform_hash(id_col: str):
    """Deterministic uniform [0, 2^32) value from the id — first 8 hex chars
    of md5, identical in DuckDB via CAST('0x' || substr(md5(id), 1, 8) AS
    UBIGINT)."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def budget_sample_exact(
    docs: DataFrame, group_col: str, weight_col: str, budget: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep hash-ranked rows per group while the exclusive prefix weight is
    below ``budget`` (first crossing row kept)."""
    order = [_uniform_hash(id_col).alias("_rank"), F.col(id_col)]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(weight_col).over(w), F.lit(0.0))
    return (
        docs.withColumn("_prev_w", prev)
        .where(F.col("_prev_w") < budget)
        .drop("_prev_w")
    )


def budget_sample_hash(
    docs: DataFrame, group_col: str, weight_col: str, budget: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-side approximate budget sampler: keep a document iff
    uniform_hash(id)/2^32 < budget / total_weight(group). The fraction join
    is null-safe so rows with a NULL group get their own quota, exactly like
    the exact variant's window partition treats them."""
    totals = docs.groupBy(group_col).agg(F.sum(weight_col).alias("_total_w"))
    frac = F.least(F.lit(1.0), F.lit(float(budget)) / F.col("_total_w"))
    fr = F.broadcast(
        totals.withColumn("_frac", frac)
        .select(F.col(group_col).alias("_grp"), "_frac"))
    return (
        docs.join(fr, docs[group_col].eqNullSafe(F.col("_grp")))
        .where(_uniform_hash(id_col) / F.lit(HASH_SPACE) < F.col("_frac"))
        .drop("_grp", "_frac")
    )

"""Data-profiling detectors from the reference's ``info`` sweep
(reference data/lic_2020.py:817-873) — entity-quality diagnostics run over
extracted triples, pure Catalyst end to end (oracle-able, no UDFs).

* ``blank_entity_flags`` — reference ``find_blank`` (data/lic_2020.py:827-838):
  an entity containing an ASCII space, a no-break space (U+00A0) or an
  ideographic space (U+3000) is flagged; the category is that of the FIRST
  such character in the entity (the reference walks chars in order and
  prints on the first hit).

* ``truncated_company_flags`` — reference ``check_company``
  (data/lic_2020.py:840-856): for company-typed entities
  (企业/机构/企业品牌), if the two characters FOLLOWING an occurrence of the
  entity in its source text form a company-suffix gram
  (公司/有限/股份/责任/集团/科技/管理/汽车), the stored entity is a truncated
  company name; the reference iteratively extends the entity by those two
  characters and re-scans. The loop is unrolled to a fixed number of
  rounds (default 3 — enough for X → X有限 → X有限公司 → one more), each
  round extending at the FIRST occurrence whose following bigram matches,
  exactly like the reference's ``for s, e in points: ... break``.

At scale both detectors are embarrassingly parallel row-local expressions —
no shuffle, no driver state; the occurrence scan is
O(|text| · |entity| · rounds) per row via higher-order array functions,
fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLANK_CHARS = ((" ", "space"), ("\xa0", "nbsp"), ("　", "ideographic"))

COMPANY_TYPES = ("企业", "机构", "企业/品牌")
COMPANY_SUFFIXES = ("公司", "有限", "股份", "责任", "集团", "科技", "管理", "汽车")


def blank_kind_expr(entity: Column) -> Column:
    """Category of the first blank-class char in ``entity`` (null if none)."""
    pos = {k: F.instr(entity, ch) for ch, k in BLANK_CHARS}
    # smallest positive position wins — the reference's char walk order is
    # positional, not by category
    first = F.least(*[F.when(p > 0, p) for p in pos.values()])
    kind = F.lit(None).cast("string")
    for k, p in reversed(pos.items()):
        kind = F.when(p == first, F.lit(k)).otherwise(kind)
    return kind


def blank_entity_flags(df: DataFrame, entity_col: str = "entity") -> DataFrame:
    """Rows whose entity contains a blank-class char, + ``blank_kind``."""
    out = df.withColumn("blank_kind", blank_kind_expr(F.col(entity_col)))
    return out.where(F.col("blank_kind").isNotNull())


def first_qualifying_hit(text: Column, entity: Column) -> Column:
    """Position (1-based, long; 0 = none) of the first NON-OVERLAPPING
    occurrence of ``entity`` in ``text`` whose following two characters are
    a company suffix. Non-overlapping because the reference's locate_entity
    restarts the KMP search at match-end (utils/kmp.py) — an occurrence
    overlapping a previous one is never visited, e.g. entity 申申 in
    申申申公司 does NOT extend.

    A left fold over all raw match positions carries (next allowed start,
    hit) through a struct accumulator — one pass, pure Catalyst."""
    ln = F.length(entity)
    occ = F.filter(
        F.sequence(F.lit(1), F.greatest(F.length(text) - ln + 1, F.lit(1))),
        lambda i: F.substring(text, i, ln) == entity,
    )
    init = F.struct(F.lit(0).cast("long").alias("nxt"),
                    F.lit(0).cast("long").alias("hit"))

    def step(acc, p):
        skip = (acc["hit"] != 0) | (p.cast("long") < acc["nxt"])
        sfx_ok = F.substring(text, (p + ln).cast("int"), F.lit(2)) \
            .isin(*COMPANY_SUFFIXES)
        return F.when(skip, acc).otherwise(
            F.when(sfx_ok, F.struct(acc["nxt"].alias("nxt"),
                                    p.cast("long").alias("hit")))
            .otherwise(F.struct((p + ln).cast("long").alias("nxt"),
                                acc["hit"].alias("hit"))))

    return F.aggregate(occ, init, step)["hit"]


def extend_company_once(text: Column, entity: Column) -> Column:
    """One reference extension round: extend ``entity`` by the suffix
    bigram at its first qualifying occurrence, else return it unchanged."""
    hit = first_qualifying_hit(text, entity)
    return F.when(hit != 0,
                  F.substring(text, hit.cast("int"), F.length(entity) + 2)
                  ).otherwise(entity)


def truncated_company_flags(
    df: DataFrame, text_col: str = "text", entity_col: str = "entity",
    type_col: str = "entity_type", rounds: int = 3,
) -> DataFrame:
    """Company-typed rows whose entity extends under the suffix rule; adds
    ``extended`` (the fully-extended name after ``rounds`` rounds)."""
    typed = df.where(F.col(type_col).isin(*COMPANY_TYPES)
                     & (F.length(entity_col) > 0))
    # "did it extend at all" ⟺ round 1 has a qualifying hit (identical
    # entity ⟹ identical fold ⟹ no later round can be the first to
    # extend). Filtering on this SINGLE bounded fold up front — instead of
    # `where(extended != entity)` at the end — matters twice over:
    # (a) PushDownPredicates substitutes filter conditions through project
    #     aliases unconditionally, so an end-filter on `extended` would be
    #     rewritten into the fully nested rounds expression (each round
    #     references its entity ~6 times → 6^rounds tree, O(|text|^rounds)
    #     per-row evaluation — measured as a hang at 300-char texts);
    # (b) rows that never extend (the overwhelming majority at corpus
    #     scale) are pruned BEFORE the per-round scans run.
    cur = typed.where(
        first_qualifying_hit(F.col(text_col), F.col(entity_col)) != 0)
    # each round binds to a fresh ATTRIBUTE, never nesting the previous
    # round's expression tree (Catalyst does not CSE across lambda scopes;
    # multiply-referenced non-cheap aliases block CollapseProject, keeping
    # the plan linear in `rounds` — verified on the optimized plan)
    cur = cur.withColumn("_e0", F.col(entity_col))
    for k in range(rounds):
        cur = cur.withColumn(
            f"_e{k + 1}",
            extend_company_once(F.col(text_col), F.col(f"_e{k}")))
    # every surviving row extended in round 1, so extended != entity holds
    # by construction — re-asserting it here would reintroduce (a)
    return cur.withColumnRenamed(f"_e{rounds}", "extended") \
        .drop(*[f"_e{k}" for k in range(rounds)])

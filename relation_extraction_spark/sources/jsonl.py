"""JSONL sources/sinks in the reference's on-disk dict shape (S1-S3).

The reference reads corpora as JSON arrays / JSONL of
``{"text": ..., "spo_list": [{subject_type, subject, predicate,
object_type: {...}, object: {...}}]}`` (data/lic_2020.py:17-31,52-56) and
writes one json line per document (data/lic_2020.py:302-309). These adapters
translate between that shape and the engine's flat triples DataFrame so a
user of the reference can feed its files in and get its files out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

_SPO = T.StructType([
    T.StructField("subject_type", T.StringType()),
    T.StructField("subject", T.StringType()),
    T.StructField("predicate", T.StringType()),
    T.StructField("object_type", T.MapType(T.StringType(), T.StringType())),
    T.StructField("object", T.MapType(T.StringType(), T.StringType())),
])
DOC_SPO_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("spo_list", T.ArrayType(_SPO)),
])


def read_doc_spo_jsonl(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    """JSONL (or JSON-array with multiline=True) corpus → one row per doc with
    a synthetic stable url key (the reference aligns files positionally;
    we key explicitly — SURVEY.md §2.3 J7).

    Key = md5(text + spo_list) with a per-duplicate ordinal suffix: two
    documents whose (text, spo_list) are byte-identical are interchangeable,
    so the ordinal is deterministic up to that interchange, and DISTINCT
    documents never collapse onto one key (the reference keeps duplicate
    lines as separate documents). Null text hashes as ''."""
    from pyspark.sql import Window

    reader = spark.read.schema(DOC_SPO_SCHEMA)
    df = reader.json(path, multiLine=multiline)
    content_key = F.md5(F.concat(
        F.coalesce(F.col("text"), F.lit("")), F.lit("\x00"),
        F.coalesce(F.to_json("spo_list"), F.lit(""))))
    w = Window.partitionBy(content_key).orderBy(content_key)
    return df.withColumn(
        "url",
        F.concat(F.lit("doc://"), content_key, F.lit("-"),
                 F.row_number().over(w).cast("string")))


def docs_to_triples(docs: DataFrame) -> DataFrame:
    """Explode spo_list → flat triples DataFrame (TRIPLE_SCHEMA shape)."""
    return (
        docs.select("url", F.explode("spo_list").alias("s"))
        .select("url", "s.subject_type", "s.subject", "s.predicate",
                "s.object_type", "s.object")
    )


def triples_to_doc_json(triples: DataFrame, docs_text: DataFrame) -> DataFrame:
    """Regroup flat triples per document and render the reference's JSONL
    line shape (S3 sink): {"text":..., "spo_list":[...]}. Write with
    ``df.write.text(...)`` on the ``json_line`` column."""
    # canonical spo order (string key over all fields; maps via to_json) so
    # the rendered line is a deterministic function of the triple SET — the
    # reference writes decode order, which a shuffle cannot reproduce
    sort_key = lambda s: F.concat_ws(  # noqa: E731
        "|", s["subject_type"], s["subject"], s["predicate"],
        F.to_json(s["object_type"]), F.to_json(s["object"]))
    cmp = lambda a, b: (  # noqa: E731
        F.when(sort_key(a) < sort_key(b), F.lit(-1))
        .when(sort_key(a) > sort_key(b), F.lit(1)).otherwise(F.lit(0)))
    grouped = (
        triples.groupBy("url")
        .agg(F.array_sort(F.collect_list(F.struct(
            "subject_type", "subject", "predicate", "object_type", "object"
        )), cmp).alias("spo_list"))
    )
    joined = docs_text.select("url", "text").join(grouped, "url", "left")
    return joined.select(
        "url",
        F.to_json(F.struct(
            F.col("text"),
            F.coalesce("spo_list", F.array().cast(
                "array<struct<subject_type:string,subject:string,predicate:string,"
                "object_type:map<string,string>,object:map<string,string>>>")).alias("spo_list"),
        )).alias("json_line"),
    )


def read_schema_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Predicate-schema JSONL (S2): one {predicate, subject_type,
    object_type:{...}} per line."""
    sch = T.StructType([
        T.StructField("predicate", T.StringType()),
        T.StructField("subject_type", T.StringType()),
        T.StructField("object_type", T.MapType(T.StringType(), T.StringType())),
    ])
    return spark.read.schema(sch).json(path)

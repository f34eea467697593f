"""User-facing facade — one object exposing every capability a user of the
reference runs today, mapped to its entry points (SURVEY.md §3):

=====================================  =========================================
reference entry point                  facade method
=====================================  =========================================
change_data_format (corpus prep, §3.1) prepare_corpus()
REModelFittingBase.test (§3.2)         extract()
combine_predicate / ensemble (§3.3)    extract_ensemble() + vote_filter()
KnowledgeGraph build/check (utils/kg)  build_kg() / correct() / self_check()
eval harness (main.py:101-110)         score()
staged run w/ checkpoints              run_pipeline()
=====================================  =========================================

Plus the training-data-curation operators (dedup / similarity / text
analysis) that a 100 TB corpus pipeline needs around KG construction.
LIC2019-style flat schemas load via ``sources.jsonl.read_schema_jsonl``;
flat predicates simply bypass the complex-triple rewrites (R1/R2 are
predicate-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import curation, dedup, graph, locate, sampling, similarity, text_analysis
from .operators.ensemble import EnsembleScorer
from .operators.eval import diff_triples, micro_prf
from .operators.extract_triples import extract_text_df, extract_triples
from .operators.kg import kg_correct, kg_edges, kg_vertices, self_check
from .operators.linking import canonical_mapping, canonicalize_edges
from .operators.rewrite_df import combine_spos_df, expand_spo_df, postprocess_df
from .operators.scorer import SurrogateScorer
from .operators.tokenize import tokenize_df
from .operators.vote import combine_results, vote_and_kg_filter
from .plans.pipeline import KGPipeline


class KGEngine:
    def __init__(self, spark: SparkSession, scorer=None, schema=None):
        """``schema``: DatasetSchema — default LIC2020 (DuIE 2.0 + rewrites);
        pass ``relation_extraction_spark.schema.flat_schema(rows)`` for
        LIC2019-style flat corpora (50 flat predicates, no recomposition)."""
        self.spark = spark
        self.scorer = scorer or SurrogateScorer()
        self.schema = schema

    # --- corpus preparation (reference §3.1) --------------------------------
    def prepare_corpus(self, docs: DataFrame, vocab: dict | None = None,
                       wordpiece_vocab: dict | None = None,
                       segmenter=None) -> DataFrame:
        """html→text extraction + tokenize/align (tokens, offsets, b2w, hand).

        ``wordpiece_vocab``: BERT vocab mapping → real WordPiece mode with
        subword splits/[UNK]/token_ids. ``segmenter``: pluggable word
        segmenter (e.g. tokenize.DictSegmenter) standing in for pkuseg."""
        return tokenize_df(extract_text_df(docs), vocab=vocab,
                           wordpiece_vocab=wordpiece_vocab, segmenter=segmenter)

    def decompose_gold(self, triples: DataFrame) -> DataFrame:
        """R4+R1: gold-side complex→simple decomposition (pure Catalyst)."""
        return expand_spo_df(triples)

    # --- inference (reference §3.2) ------------------------------------------
    def extract(self, docs: DataFrame) -> DataFrame:
        return extract_triples(extract_text_df(docs), scorer=self.scorer,
                               schema=self.schema)

    def extract_one(self, text: str) -> list[dict]:
        """Single-document convenience: one string in → formal triples out
        (list of {subject_type, subject, predicate, object_type, object}
        dicts), mirroring the reference's interactive ``test_a_line`` REPL
        (reference main.py:320-337: tokenize one string → model.predicate →
        get_formal_result). Driver-side — no Spark job is launched; it runs
        the exact per-document cascade the distributed ``extract`` runs
        inside its Arrow batches, so one-string results are identical to
        the corpus path's rows for the same text."""
        from .operators.extract_triples import decode_document

        return decode_document(text, self.scorer, schema=self.schema)

    def extract_ensemble(self, docs: DataFrame, scorers: list, weights: list[float]) -> DataFrame:
        return extract_triples(
            extract_text_df(docs), scorer=EnsembleScorer(scorers, weights),
            schema=self.schema)

    def recombine(self, triples: DataFrame, docs: DataFrame) -> DataFrame:
        """R2+R3 over externally-produced simple triples."""
        return combine_spos_df(triples, docs)

    def postprocess(self, triples: DataFrame, docs: DataFrame) -> DataFrame:
        return postprocess_df(triples, docs)

    # --- ensemble voting (reference §3.3) -------------------------------------
    def vote_filter(self, model_outputs: DataFrame, reference_kg: DataFrame,
                    min_votes: int = 3):
        return vote_and_kg_filter(model_outputs, reference_kg, min_votes)

    def merge_results(self, main: DataFrame, voted: DataFrame) -> DataFrame:
        return combine_results(main, voted)

    # --- knowledge graph -------------------------------------------------------
    def build_kg(self, triples: DataFrame) -> tuple[DataFrame, DataFrame]:
        return kg_edges(triples), kg_vertices(triples)

    def correct(self, triples_with_text: DataFrame, edges: DataFrame,
                vertices: DataFrame) -> DataFrame:
        return kg_correct(triples_with_text, edges, vertices)

    def self_check(self, edges: DataFrame, std_vertices: DataFrame) -> DataFrame:
        return self_check(edges, std_vertices)

    def canonicalize(self, edges: DataFrame,
                     signature_stop_max_df: int | None = None) -> DataFrame:
        from pyspark.sql import functions as F

        entities = edges.select(F.col("subject").alias("entity")).union(
            edges.select("object")).dropDuplicates()
        return canonicalize_edges(edges, canonical_mapping(
            entities, signature_stop_max_df=signature_stop_max_df))

    # --- evaluation --------------------------------------------------------------
    def score(self, pred: DataFrame, gold: DataFrame) -> dict:
        return micro_prf(pred, gold)

    def diff(self, a: DataFrame, b: DataFrame):
        return diff_triples(a, b)

    # --- staged, resumable run -----------------------------------------------------
    def run_pipeline(self, docs: DataFrame, catalog_root: str, resume: bool = True):
        return KGPipeline(self.spark, catalog_root, scorer=self.scorer).run(docs, resume)

    def run_incremental(self, new_docs: DataFrame, catalog_root: str):
        """Crawl-increment run: extraction touches only urls absent from
        the committed catalog; KG stages rebuild over the merged triples
        (entity-set sized — measured flat 500k→5M docs)."""
        return KGPipeline(self.spark, catalog_root,
                          scorer=self.scorer).run_incremental(new_docs)

    # --- training-data curation -------------------------------------------------------
    dedup = dedup
    similarity = similarity
    text_analysis = text_analysis
    sampling = sampling
    locate = locate
    curation = curation
    graph = graph

    def curate(self, docs: DataFrame, benchmark: DataFrame | None = None,
               id_col: str = "doc_id", text_col: str = "text",
               min_quality: float = 0.5, max_dup_word_frac: float = 0.6,
               max_top_gram_frac: float = 0.5, decontaminate_n: int = 13,
               paragraph_sep: str = "\n", materialize: bool = True) -> DataFrame:
        """The standard pretraining-curation chain, all Catalyst-side:
        exact dedup → global paragraph dedup → quality + repetition gates →
        (optional) benchmark decontamination → PII redaction (last, so the
        benchmark grams match the ORIGINAL text, not placeholder tokens).
        Returns the curated corpus ``(id_col, text_col)``; every stage is a
        uniform-key shuffle or a shuffle-free projection, so the chain
        holds its shape at 100 TB.

        See :func:`relation_extraction_spark.operators.curation.curate_docs`
        (this is a thin delegate; KGPipeline.run(curate=True) checkpoints
        the same chain as a catalog stage)."""
        from .operators.curation import curate_docs

        return curate_docs(
            docs, benchmark=benchmark, id_col=id_col, text_col=text_col,
            min_quality=min_quality, max_dup_word_frac=max_dup_word_frac,
            max_top_gram_frac=max_top_gram_frac,
            decontaminate_n=decontaminate_n, paragraph_sep=paragraph_sep,
            materialize=materialize)

"""Classification module analog (reference: solr-8.4.0/lucene/classification).

Two index-backed text classifiers, re-expressed as DataFrame plans:

KNearestNeighborClassifier (KNearestNeighborClassifier.java):
  knnSearch = a MoreLikeThis disjunction built from the input text ->
  BM25 top-k against the indexed corpus -> buildListFromTopDocs vote
  (:192-238): per class c over the top-k hits,
      count_c   = #hits of class c
      boosts_c  = sum(hit.score / maxScore)
      score(c)  = (count_c * (boosts_c / count_c)) / k   == boosts_c / k,
  with the sumdoc < k correction multiplying every class by k / sumdoc
  (sumdoc = total class-labelled hits), i.e. the denominator becomes the
  number of labelled hits actually seen. Assigned class = argmax score
  (classifyFromTopDocs:130-141). The reference iterates a HashMap with a
  strict '>' so exact ties resolve in hash order; we pin the deterministic
  tie-break (score desc, class asc) and document the divergence.

SimpleNaiveBayesClassifier (SimpleNaiveBayesClassifier.java):
  assigned class = argmax_c  log P(c) + sum_{w in tokens(text)} log P(w|c)
  (:148, repeated tokens count repeatedly per calculateLogLikelihood:204-224)
    log P(c)   = log(docCount(c)) - log(N)            (calculateLogPrior)
    P(w|c)     = (df(w, c) + 1) / (avgUniqueTermsPerDoc * docCount(c) + N)
  where df(w, c) = #docs of class c containing w (getWordFreqForClass),
  avgUniqueTermsPerDoc = sumDocFreq(text field) / docCount (getTextTerm-
  FreqForClass:233-242) and N = #docs carrying the class field
  (countDocsWithClass).

Scale shape: the NB "model" is one groupBy over the tokenized corpus — a
(term, class) -> docfreq table plus per-class counts, built once and reused
(CachingNaiveBayesClassifier's role); classify joins the input's token
multiset against that table, all map-side-combined aggregations, nothing
per-row in Python. The KNN path rides the engine's pruned BM25 kernel;
bulk many-input classification is the sparse-KNN plan
(pipeline/similarity.py) with this module's vote folded on top.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .analysis.tokenizer import Analyzer, STANDARD
from .operators.collectors import more_like_this_terms
from .search import query as Q

__all__ = ["knn_classify_df", "NaiveBayesModel", "nb_train", "nb_classify_df"]


# --------------------------------------------------------------------------
# KNearestNeighborClassifier
# --------------------------------------------------------------------------

def knn_classify_df(searcher, text: str, class_df: DataFrame,
                    class_col: str = "lang", key_col: str = "doc_id",
                    k: int = 10, max_query_terms: int = 5,
                    key_type: str = "string", fuzzy: bool = False,
                    analyzer: Analyzer = STANDARD) -> DataFrame:
    """Ranked class list for one input text (Classifier.getClasses).

    Returns (class, score) rows sorted score desc, class asc. The plan:
    MLT term selection (driver-side math over the input's own tf and a
    bounded per-term stats lookup) -> the engine's distributed scores_df ->
    top-k -> a k-row class join + one tiny aggregation.

    fuzzy=True is the KNearestFuzzyClassifier variant
    (KNearestFuzzyClassifier.java: the knn query is a FuzzyLikeThisQuery —
    each selected term matches within edit distance, tolerating typos in
    the input); every fuzzy leaf rides the engine's capped blended-df
    rewrite."""
    tf: dict = {}
    for term, _pos in analyzer.tokenize(text or ""):
        tf[term] = tf.get(term, 0) + 1
    gdf = searcher._global_df(list(tf))
    terms = more_like_this_terms(tf, gdf, searcher.doc_count,
                                 max_terms=max_query_terms)
    if not terms:
        return class_df.select(
            F.col(class_col).alias("class"),
            F.lit(0.0).alias("score")).limit(0)
    if fuzzy:
        q = Q.BooleanQuery(should=tuple(
            Q.FuzzyQuery(t, max_edits=1 if len(t) < 6 else 2)
            for t in terms))
    else:
        q = Q.BooleanQuery(should=tuple(Q.TermQuery(t) for t in terms))
    # key_type: the tie-break (score desc, key asc) must compare keys in
    # their NATURAL order — numeric corpora pass "long" so '10' sorts after
    # '2', exactly like docid tie-breaking in TopDocs
    sc = searcher.scores_df(q)
    d = searcher.docs_df().select(
        "segment_id", "docid", F.col("key").cast(key_type).alias("key"))
    hits = (sc.join(d, ["segment_id", "docid"])
            .orderBy(F.desc("score"), F.asc("key")).limit(k))
    # maxScore comes from the FULL top-k, before the class join
    # (buildListFromTopDocs:195 reads scoreDocs[0] of the raw TopDocs)
    hits = hits.withColumn("maxs", F.max("score").over(Window.partitionBy()))
    labelled = hits.join(
        class_df.select(F.col(key_col).cast(key_type).alias("key"),
                        F.col(class_col).alias("class")), "key")
    # buildListFromTopDocs: boosts_c = sum(score/maxScore); denominator k,
    # corrected to sumdoc when fewer than k labelled hits came back.
    # The unpartitioned windows run over the ALREADY-limited <=k-row hit
    # list (TopDocs is driver-small by definition), never the corpus.
    agg = (labelled
           .groupBy("class")
           .agg(F.sum(F.col("score") / F.col("maxs")).alias("boosts"),
                F.count("*").alias("cnt")))
    agg = agg.withColumn(
        "sumdoc", F.sum("cnt").over(Window.partitionBy()))
    return (agg.select(
        "class",
        (F.col("boosts") / F.when(F.col("sumdoc") < k, F.col("sumdoc"))
         .otherwise(F.lit(k))).alias("score"))
        .orderBy(F.desc("score"), F.asc("class")))


# --------------------------------------------------------------------------
# SimpleNaiveBayesClassifier
# --------------------------------------------------------------------------

class NaiveBayesModel:
    """The per-class statistics the classifier reads from the index: a
    (term, class, df) DataFrame + per-class doc counts + the smoothing
    denominator constants."""

    def __init__(self, term_class_df: DataFrame, class_counts: DataFrame,
                 n_docs: int, avg_unique_terms: float):
        self.term_class_df = term_class_df        # (term, class, dfc)
        self.class_counts = class_counts          # (class, docs)
        self.n_docs = n_docs
        self.avg_unique_terms = avg_unique_terms


def nb_train(spark: SparkSession, docs: DataFrame, text_col: str = "text",
             class_col: str = "lang",
             analyzer: Analyzer = STANDARD) -> NaiveBayesModel:
    """One distributed pass over the labelled corpus: tokenize -> per-doc
    DISTINCT terms -> (term, class) doc-frequency counts. This is the same
    token stream the index builder inverts; Lucene reads these counts off
    the index per query (getWordFreqForClass runs a search per word), the
    model table just materializes them once."""
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def toks(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: sorted({w for w, _ in analyzer.tokenize(t or "")}))

    per_doc = (docs.select(F.col(class_col).alias("class"),
                           F.explode(toks(F.col(text_col))).alias("term")))
    term_class = (per_doc.groupBy("term", "class")
                  .agg(F.count("*").alias("dfc")))
    class_counts = (docs.groupBy(F.col(class_col).alias("class"))
                    .agg(F.count("*").alias("docs")))
    n_docs = docs.count()
    # sumDocFreq = total (doc, distinct term) pairs; avg per doc
    n_pairs = per_doc.count()
    return NaiveBayesModel(term_class.persist(), class_counts.persist(),
                           n_docs, n_pairs / max(1, n_docs))


def nb_classify_df(spark: SparkSession, model: NaiveBayesModel,
                   inputs: list[tuple], analyzer: Analyzer = STANDARD,
                   return_scores: bool = False) -> DataFrame:
    """Classify (src_id, text) inputs; returns (src_id, class) argmax rows
    (ties broken class asc — deterministic where the reference's HashMap
    order is not). The input token multisets are metadata-sized (they are
    typed queries, not a corpus) and broadcast into joins against the model
    table; nothing about the model is ever collected."""
    rows = []
    for src_id, text in inputs:
        counts: dict = {}
        for w, _pos in analyzer.tokenize(text or ""):
            counts[w] = counts.get(w, 0) + 1
        for w, m in counts.items():
            rows.append((int(src_id), w, int(m)))
    if not rows:
        return spark.createDataFrame(
            [], "src_id long, class string")
    words = spark.createDataFrame(rows, "src_id long, term string, mult int")
    # grid: every (input word) x (class); absent (term, class) pairs smooth
    # to df=0 (add-one keeps them finite) — the reference's hits=0 case
    grid = words.crossJoin(F.broadcast(model.class_counts))
    scored = (grid.join(F.broadcast(model.term_class_df), ["term", "class"],
                        "left")
              .withColumn("dfc", F.coalesce(F.col("dfc"), F.lit(0)))
              .withColumn(
                  "ll",
                  F.col("mult").cast("double")
                  * F.log((F.col("dfc") + F.lit(1.0))
                          / (F.lit(model.avg_unique_terms)
                             * F.col("docs") + F.lit(float(model.n_docs))))))
    per_class = (scored.groupBy("src_id", "class")
                 .agg(F.sum("ll").alias("ll"),
                      F.first("docs").alias("docs"))
                 .withColumn(
                     "score",
                     F.col("ll") + F.log(F.col("docs").cast("double"))
                     - F.lit(math.log(float(model.n_docs)))))
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("class"))
    out = (per_class.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1))
    cols = ["src_id", "class"] + (["score"] if return_scores else [])
    return out.select(*cols).orderBy("src_id")

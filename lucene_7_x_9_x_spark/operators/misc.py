"""Misc-module operators: HighFreqTerms and the term-vector highlighter.

Reference behavior:
  * HighFreqTerms — lucene/misc/src/java/org/apache/lucene/misc/
    HighFreqTerms.java: top-N terms of a field ordered by docFreq
    (DocFreqComparator) or totalTermFreq (TotalTermFreqComparator),
    computed from the term dictionary without touching documents.
    Like Lucene, the counts do NOT discount deleted docs (docFreq is a
    segment-dictionary statistic there too).
  * Term-vector highlighting — the fast-vector-highlighter module's
    FieldTermStack (vectorhighlight/FieldTermStack.java) sources match
    positions from STORED term vectors instead of re-analyzing stored
    text; the fragment is a position window around the first match
    (SimpleFragListBuilder), every in-window occurrence wrapped in tags
    (BaseFragmentsBuilder.getFragmentSource + preTag/postTag).

Spark-first: both are pure DataFrame compositions — an aggregation over the
postings table, and a k-row broadcast join against the partition-pruned tvd
sidecar followed by whole-stage-codegen array ops. No UDFs, no collects
beyond the searcher's own <=k hit rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def high_freq_terms(searcher, n: int = 10, order_by: str = "ttf") -> DataFrame:
    """Top-``n`` terms by ``df`` (docFreq) or ``ttf`` (totalTermFreq).

    One partial-aggregated shuffle over the postings table (each row already
    carries the per-(segment, term) df/ttf written at encode time), then a
    TakeOrdered — no full sort, no decode of any posting block. Ties break by
    term ascending (HighFreqTerms' comparators tiebreak on the term bytes).
    """
    if order_by not in ("df", "ttf"):
        raise ValueError(f"order_by must be df|ttf, got {order_by!r}")
    agg = (searcher.postings_df()
           .groupBy("term")
           .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf")))
    return (agg.orderBy(F.col(order_by).desc(), F.col("term"))
            .limit(n))


def tv_highlight_topk(searcher, docs: DataFrame, term: str, k: int = 10,
                      window: int = 3, key_cast: str = "long") -> DataFrame:
    """BM25 top-k for ``term`` with a term-vector-sourced highlight snippet.

    Positions come from the stored term-vector sidecar (FieldTermStack role —
    the index must be built with ``store_term_vectors=True``), never from
    re-analysis. The fragment is the ``2*window+1``-token window around the
    FIRST match position, clipped at doc bounds, with every in-window
    occurrence of ``term`` wrapped in <b></b>.

    Plan shape: searcher top-k (<=k rows) -> broadcast join against the tvd
    partitions (partition-pruned to the hit segments) -> broadcast join to
    the source table for text -> array slice/transform/join, all JVM-side.
    """
    from ..search import query as Q

    td = searcher.search(Q.TermQuery(term), k=k)
    hits = td.hits
    spark = searcher.spark
    if len(hits) == 0:
        return spark.createDataFrame(
            [], "doc_id long, score_micro long, first_pos long, "
                "snippet string")
    hit_rows = [(int(r.segment_id), int(r.docid), int(r.key),
                 float(r.score)) for r in hits.itertuples()]
    hdf = spark.createDataFrame(
        hit_rows, "segment_id int, docid int, doc_id long, score double")

    # first match position per hit from the STORED vector
    tv = searcher.term_vectors_df()
    pos = (tv.join(F.broadcast(hdf), ["segment_id", "docid"])
           .select("doc_id", "score", F.explode("tv").alias("e"))
           .where(F.col("e.term") == term)
           .select("doc_id", "score",
                   F.element_at("e.positions", 1).alias("first_pos")))

    toks = F.split(F.col("text"), " ")
    start = F.greatest(F.col("first_pos") - window, F.lit(0))
    end = F.least(F.col("first_pos") + window, F.size(toks) - 1)
    frag = F.slice(toks, start + 1, end - start + 1)
    marked = F.transform(
        frag, lambda x: F.when(x == term,
                               F.concat(F.lit("<b>"), x, F.lit("</b>")))
        .otherwise(x))
    return (pos.join(F.broadcast(
                docs.select(F.col("doc_id").cast(key_cast).alias("doc_id"),
                            "text")), "doc_id")
            .select(
                "doc_id",
                F.floor(F.col("score") * 1e6 + F.lit(0.5))
                 .cast("long").alias("score_micro"),
                F.col("first_pos").cast("long").alias("first_pos"),
                F.array_join(marked, " ").alias("snippet")))

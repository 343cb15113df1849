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


def term_offsets_df(searcher, terms, hit_df) -> DataFrame:
    """Per-position character offsets of ``terms`` in the hit docs, read from
    the postings' OFFSETS channel (never re-analysis) — the posting-offsets
    source of Lucene's UnifiedHighlighter (uhighlight/FieldOffsetStrategy:
    OffsetSource.POSTINGS, chosen when the field was indexed with
    IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS; demo
    StartsTest.java indexes with that rung).

    ``hit_df``: small DataFrame of (segment_id, docid) hits (<=k rows, from a
    searcher top-k — live by construction, so no delete masking is needed).
    Returns (segment_id, docid, term, start, end), one row per matched
    position. Plan shape: the postings scan is term-pruned (row-group
    min/max on the term-sorted files), offsets decode inside an Arrow-batched
    mapInPandas with a broadcast hit set, and only the hit docs' positions
    leave the stage.
    """
    import numpy as np
    import pandas as pd
    from ..functions.codecs import decode_blocks

    hits: dict[int, "np.ndarray"] = {}
    for r in hit_df.select("segment_id", "docid").collect():  # <=k rows
        hits.setdefault(int(r["segment_id"]), []).append(int(r["docid"]))
    hits = {s: np.asarray(sorted(ds), dtype=np.int64)
            for s, ds in hits.items()}

    cols = ["segment_id", "docid", "term", "start", "end"]

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                wanted = hits.get(int(r.segment_id))
                if wanted is None:
                    continue
                blocks = [b if isinstance(b, dict) else b.asDict()
                          for b in r.blocks]
                d, f, _, _, st, en = decode_blocks(
                    blocks, want_positions=True, want_offsets=True)
                keep = np.isin(d, wanted)
                if not keep.any():
                    continue
                pmask = np.repeat(keep, f)
                docs_per_pos = np.repeat(d, f)[pmask]
                out.append(pd.DataFrame({
                    "segment_id": np.full(docs_per_pos.size,
                                          int(r.segment_id), dtype=np.int32),
                    "docid": docs_per_pos.astype(np.int32),
                    "term": r.term,
                    "start": st[pmask],
                    "end": en[pmask],
                }))
            yield (pd.concat(out) if out
                   else pd.DataFrame({c: [] for c in cols}))

    rows = searcher.postings_df().where(F.col("term").isin(list(terms)))
    return rows.mapInPandas(
        gen, "segment_id int, docid int, term string, start long, end long")


def unified_highlight_topk(searcher, docs: DataFrame, terms, k: int = 10,
                           frag_chars: int = 80,
                           key_cast: str = "long") -> DataFrame:
    """UnifiedHighlighter role over the postings-offsets source: BM25 top-k
    for the disjunction of ``terms``, each hit carrying its best passage.

    Match offsets come from the index's offsets channel (term_offsets_df
    above), NOT from re-analyzing stored text — the whole point of indexing
    offsets (UnifiedHighlighter OffsetSource.POSTINGS). Passage selection is
    deterministic: every match start is a candidate anchor; the passage is
    the ``frag_chars``-char window whose anchor covers the most matches
    entirely (ties -> earliest anchor), mirroring the highest-scoring-passage
    choice of UnifiedHighlighter's PassageScorer with a fixed-length
    BreakIterator.

    Returns (doc_id, score_micro, n_matches, passage_start, snippet) — the
    snippet is the raw text slice [passage_start, passage_start+frag_chars).
    All joins are broadcast (<=k hit rows x their match positions).
    """
    from ..search import query as Q

    q = Q.BooleanQuery(should=tuple(Q.TermQuery(t) for t in terms))
    td = searcher.search(q, k=k)
    hits = td.hits
    spark = searcher.spark
    if len(hits) == 0:
        return spark.createDataFrame(
            [], "doc_id long, score_micro long, n_matches long, "
                "passage_start long, snippet string")
    hit_rows = [(int(r.segment_id), int(r.docid), int(r.key),
                 float(r.score)) for r in hits.itertuples()]
    hdf = spark.createDataFrame(
        hit_rows, "segment_id int, docid int, doc_id long, score double")

    offs = term_offsets_df(searcher, terms, hdf)
    m = (offs.join(F.broadcast(hdf), ["segment_id", "docid"])
         .select("doc_id", "score", "start", "end"))

    anchors = m.select("doc_id", F.col("start").alias("anchor")).distinct()
    covered = (anchors.join(m, "doc_id")
               .where((F.col("start") >= F.col("anchor"))
                      & (F.col("end") <= F.col("anchor") + frag_chars))
               .groupBy("doc_id", "anchor")
               .agg(F.count("*").alias("in_window")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.col("in_window").desc(), F.col("anchor").asc())
    best = (covered.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("doc_id", F.col("anchor").alias("passage_start")))
    nm = m.groupBy("doc_id").agg(F.count("*").alias("n_matches"),
                                 F.first("score").alias("score"))

    return (nm.join(best, "doc_id")
            .join(F.broadcast(
                docs.select(F.col("doc_id").cast(key_cast).alias("doc_id"),
                            "text")), "doc_id")
            .select(
                "doc_id",
                F.floor(F.col("score") * 1e6 + F.lit(0.5))
                 .cast("long").alias("score_micro"),
                F.col("n_matches").cast("long"),
                F.col("passage_start").cast("long"),
                F.expr(f"substring(text, passage_start + 1, {int(frag_chars)})")
                 .alias("snippet")))

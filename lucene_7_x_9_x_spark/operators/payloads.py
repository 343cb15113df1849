"""Payload scoring over the postings' .pay channel.

Semantics sources (behavior only):
  queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java
    — score a term's matches by a function of the payloads at its matched
    positions (includeSpanScore=false: the payload aggregate IS the score)
  queries/.../payloads/PayloadFunction.java + Min/Max/Sum/AveragePayloadFunction
  .pay postings channel: Lucene84PostingsFormat.java:99-103
  demo: LuceneDemo/src/main/java/lucene/AnalyzerTest/PayloadAnalyzer.java

Scale shape: the postings scan is pruned to the query's terms (parquet
row-group min/max on the term-sorted files — the term-dictionary role), the
per-(segment, term) rows decode inside an Arrow-batched mapInPandas with
numpy reduceat aggregation (zero per-position Python), deletes mask via the
task-local per-segment .liv read, and only aggregated (doc, term) rows leave
the stage. The final combine is a JVM-side groupBy + TakeOrderedAndProject.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import decode_blocks

__all__ = ["payload_term_aggregates", "payload_score_topk",
           "payload_sparse_dot_topk"]

_AGG_SCHEMA = ("segment_id int, docid int, term string, "
               "pay_min long, pay_max long, pay_sum long, freq long")


def payload_term_aggregates(searcher, terms: list[str]) -> DataFrame:
    """One row per live (doc, term) with min/max/sum payload aggregates —
    the PayloadFunction pre-aggregation, computed where the postings live."""
    spec = searcher._del_spec

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                blocks = [b if isinstance(b, dict) else b.asDict()
                          for b in r.blocks]
                d, f, _, _, pay = decode_blocks(
                    blocks, want_positions=True, want_payloads=True)
                if d.size == 0:
                    continue
                offs = np.zeros(d.size, dtype=np.int64)
                offs[1:] = np.cumsum(f)[:-1]
                p_min = np.minimum.reduceat(pay, offs)
                p_max = np.maximum.reduceat(pay, offs)
                p_sum = np.add.reduceat(pay, offs)
                if spec is not None:
                    dels = spec.deleted_for(int(r.segment_id))
                    if dels is not None and dels.size:
                        keep = ~np.isin(d, dels)
                        d, f = d[keep], f[keep]
                        p_min, p_max, p_sum = (p_min[keep], p_max[keep],
                                               p_sum[keep])
                if d.size == 0:
                    continue
                out.append(pd.DataFrame({
                    "segment_id": np.full(d.size, int(r.segment_id),
                                          dtype=np.int32),
                    "docid": d.astype(np.int32),
                    "term": r.term,
                    "pay_min": p_min, "pay_max": p_max, "pay_sum": p_sum,
                    "freq": f,
                }))
            yield (pd.concat(out) if out else pd.DataFrame(
                {c: [] for c in ["segment_id", "docid", "term", "pay_min",
                                 "pay_max", "pay_sum", "freq"]}))

    rows = searcher.postings_df().where(F.col("term").isin(list(terms)))
    return rows.mapInPandas(gen, _AGG_SCHEMA)


_FN_COL = {"min": "pay_min", "max": "pay_max", "sum": "pay_sum"}


def payload_score_topk(searcher, term: str, fn: str = "max",
                       k: int = 10) -> DataFrame:
    """PayloadScoreQuery(SpanTermQuery(term), fn, includeSpanScore=false):
    top-k docs by the payload aggregate. fn in {min, max, sum, avg}.
    Returns (segment_id, docid, key, score double)."""
    agg = payload_term_aggregates(searcher, [term])
    if fn == "avg":
        score = (F.col("pay_sum").cast("double")
                 / F.col("freq").cast("double"))
    elif fn in _FN_COL:
        score = F.col(_FN_COL[fn]).cast("double")
    else:
        raise ValueError(f"unknown payload function {fn!r}")
    scored = agg.select("segment_id", "docid", score.alias("score"))
    keyed = searcher.docs_df().select("segment_id", "docid", "key")
    return (scored.join(keyed, ["segment_id", "docid"])
            .orderBy(F.desc("score"), F.asc("segment_id"), F.asc("docid"))
            .limit(int(k))
            .select("segment_id", "docid", "key", "score"))


def payload_sparse_dot_topk(searcher, query_weights: dict[str, float],
                            k: int = 10) -> DataFrame:
    """Sparse-vector KNN over the payload channel: dimension = term, doc
    component = SUM of that term's payloads in the doc, score = dot product
    with the query vector (the TestSparseKNN1.java shape, weights carried in
    .pay instead of a side table). Disjunctive: any doc sharing >=1 dimension
    scores. Returns (segment_id, docid, key, score double)."""
    terms = sorted(query_weights)
    agg = payload_term_aggregates(searcher, terms)
    w = F.create_map(*[x for t in terms
                       for x in (F.lit(t), F.lit(float(query_weights[t])))])
    contrib = (agg.select(
        "segment_id", "docid",
        (w[F.col("term")] * F.col("pay_sum").cast("double")).alias("c")))
    scored = (contrib.groupBy("segment_id", "docid")
              .agg(F.sum("c").alias("score")))
    keyed = searcher.docs_df().select("segment_id", "docid", "key")
    return (scored.join(keyed, ["segment_id", "docid"])
            .orderBy(F.desc("score"), F.asc("segment_id"), F.asc("docid"))
            .limit(int(k))
            .select("segment_id", "docid", "key", "score"))

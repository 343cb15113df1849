"""Rescorer: re-rank the top window of a first-pass search with a second query.

Semantics source (behavior only): o.a.l/search/QueryRescorer.java — run the
first query for window_size hits, evaluate the second query ONLY on those hits,
combine per hit (default: first + weight * second when the second query
matches, first alone otherwise), re-sort by combined score then docid.
SortRescorer is the orderBy variant (Spark built-in).

Scale shape: the second pass touches window_size rows, never the corpus —
exactly the two-phase shape Lucene uses to keep expensive queries off the hot
path (TwoPhaseIterator economics at the ranking level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import query as Q
from .kernel import merge_top_k

__all__ = ["rescore"]


def rescore(searcher, first_query: Q.Query, second_query: Q.Query,
            k: int = 10, window_size: int = 100,
            second_weight: float = 1.0) -> pd.DataFrame:
    """QueryRescorer.rescore analog. Returns the re-ranked hits DataFrame
    (rank, segment_id, docid, key, score) with combined scores."""
    from pyspark.sql import functions as F

    top = searcher.search(first_query, k=window_size)
    hits = top.hits
    if not len(hits):
        return hits
    pairs = {(int(r.segment_id), int(r.docid)) for r in hits.itertuples()}
    # Evaluate the second query distributed, then SEMI-JOIN to the window's
    # (segment_id, docid) pairs BEFORE materializing on the driver: the isin
    # over <= window_size struct literals pushes into the plan, so at most
    # window_size rows ever reach toPandas() regardless of the second query's
    # df (QueryRescorer touches only the window, QueryRescorer.java:63-80).
    pair_lits = [F.struct(F.lit(s), F.lit(d)) for (s, d) in sorted(pairs)]
    second = (
        searcher.scores_df(second_query)
        .where(F.struct(F.col("segment_id").cast("int"),
                        F.col("docid").cast("int")).isin(pair_lits))
        .toPandas()
    )
    smap = {
        (int(r.segment_id), int(r.docid)): float(r.score)
        for r in second.itertuples()
        if (int(r.segment_id), int(r.docid)) in pairs
    }
    combined = []
    for r in hits.itertuples():
        key = (int(r.segment_id), int(r.docid))
        sc = float(r.score) + second_weight * smap.get(key, 0.0)
        combined.append((key[0], key[1], getattr(r, "key", None), sc))
    per_seg: dict = {}
    for sid, docid, _k, sc in combined:
        per_seg.setdefault(sid, ([], []))
        per_seg[sid][0].append(docid)
        per_seg[sid][1].append(sc)
    merged = merge_top_k(
        [(sid, np.asarray(d), np.asarray(s)) for sid, (d, s) in per_seg.items()],
        k, seg_ords=getattr(searcher, "seg_ords", None))
    out = pd.DataFrame(merged, columns=["segment_id", "docid", "score"])
    out.insert(0, "rank", np.arange(1, len(out) + 1))
    keymap = {(int(r.segment_id), int(r.docid)): getattr(r, "key", None)
              for r in hits.itertuples()}
    out["key"] = [keymap.get((int(s), int(d)))
                  for s, d in zip(out["segment_id"], out["docid"])]
    return out[["rank", "segment_id", "docid", "key", "score"]]

"""Per-segment HNSW approximate nearest neighbor — the Lucene 9.x KNN analog.

Lucene 9.x builds one HNSW graph PER SEGMENT (Lucene91HnswVectorsFormat;
util/hnsw/HnswGraphBuilder.java) and KnnVectorQuery searches every segment's
graph for k candidates, then merges across segments by (score desc, docid asc)
— the tie-break the reference demos pin down (LuceneDemo9.1.0
TieBreakDocIdKNNQuery.java, LuceneDemo9.0.0 facet/TestKnnTieBreak.java;
exercised at scale by LuceneDemo9.8.0 TestSparseKNN1.java).

The Spark mapping is exact: vectors are hash-bucketed into segments, each
segment's graph is built and searched inside one `applyInPandas` task (the
same single-writer-per-segment model as Lucene's per-segment build), and the
<= k * n_segments survivors merge through a tiny rank window — no reducer
ever sees a full scored corpus. At 100 TB: segment count scales with the
data, per-task memory is bounded by `vectors_per_segment`, and queries ride
a broadcast.

Faithfulness notes:
  * level assignment is Lucene's geometric ml = 1/ln(M) draw
    (HnswGraphBuilder.getRandomGraphLevel), but seeded from md5(vec_id) so
    the graph — and therefore the approximate result set — is deterministic
    across runs and cluster sizes (Lucene seeds from Random; determinism is
    the property the oracle gate needs).
  * neighbor selection uses the diversity heuristic
    (HnswGraphBuilder.diversityCheck: a candidate is kept only if it is
    closer to the node than to any already-selected neighbor).
  * KnnVectorQuery falls back to an EXACT scan when the graph search would
    visit more nodes than k-vs-filter budgets allow
    (AbstractKnnVectorQuery.exactSearch, 9.1+). `ef_search >= segment size`
    triggers the same fallback here, which is what makes the operator
    oracle-checkable against brute-force SQL.

Similarity: cosine (VectorSimilarityFunction.COSINE), scored on normalized
vectors so the graph works on dot products.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["hnsw_top_k", "HnswGraph", "build_hnsw_graph", "search_hnsw_graph"]


def _unit_interval(vec_id: int) -> float:
    """Deterministic U(0,1) draw per vector id (md5, like the text engine's
    salting) — replaces HnswGraphBuilder's Random for reproducibility."""
    h = int.from_bytes(hashlib.md5(b"hnsw:%d" % vec_id).digest()[:8], "big")
    return (h + 0.5) / 2.0 ** 64


class HnswGraph:
    """In-memory per-segment graph: normalized vectors + adjacency per level.

    neighbors[level][i] is a python list of node ords; level > node's level
    has no entry for i (Lucene's OnHeapHnswGraph layout).
    """

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, m: int):
        self.ids = ids            # segment-local ord -> global vec_id
        self.vecs = vecs          # L2-normalized float64 (n, dim)
        self.m = m
        self.levels = np.zeros(len(ids), dtype=np.int32)
        self.neighbors: list[list[list[int] | None]] = []
        self.entry = -1

    def top_level(self) -> int:
        return len(self.neighbors) - 1


def _search_layer(g: HnswGraph, q: np.ndarray, eps: list[int], ef: int,
                  level: int):
    """HnswGraphSearcher.searchLevel: best-first expansion keeping an ef-sized
    result heap; ties (equal score) resolve toward the smaller ord so runs
    are deterministic. Returns (ords, scores) sorted score desc, ord asc."""
    sims = g.vecs[eps] @ q
    # visited set + two "heaps" kept as sorted python lists (segment-local
    # sizes make heapq vs list irrelevant; determinism matters more)
    import heapq
    visited = set(eps)
    # candidate max-heap by similarity; result min-heap of size ef
    cand = [(-float(s), int(e)) for s, e in zip(sims, eps)]
    heapq.heapify(cand)
    res = [(float(s), -int(e)) for s, e in zip(sims, eps)]
    heapq.heapify(res)
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        negs, e = heapq.heappop(cand)
        worst = res[0][0] if len(res) >= ef else -math.inf
        if -negs < worst:
            break
        nbrs = [n for n in (g.neighbors[level][e] or [])
                if n not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        nsims = g.vecs[nbrs] @ q
        for s, n in zip(nsims, nbrs):
            s = float(s)
            if len(res) < ef or s > res[0][0] or (
                    s == res[0][0] and -n > res[0][1]):
                heapq.heappush(cand, (-s, int(n)))
                heapq.heappush(res, (s, -int(n)))
                if len(res) > ef:
                    heapq.heappop(res)
    out = sorted(((s, -negord) for s, negord in res),
                 key=lambda t: (-t[0], t[1]))
    ords = np.array([o for _, o in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return ords, scores


def _diverse_select(g: HnswGraph, cand_ords: np.ndarray,
                    cand_sims: np.ndarray, m: int) -> list[int]:
    """HnswGraphBuilder.diversityCheck: scan candidates nearest-first; keep c
    only if sim(c, node) > sim(c, any kept neighbor)."""
    kept: list[int] = []
    for o, s in zip(cand_ords, cand_sims):
        if len(kept) >= m:
            break
        if all(float(g.vecs[o] @ g.vecs[k]) < s for k in kept):
            kept.append(int(o))
    return kept


def build_hnsw_graph(ids: np.ndarray, vecs: np.ndarray, m: int = 16,
                     ef_construction: int = 100) -> HnswGraph:
    """Build one segment's graph, inserting in ord order (Lucene inserts in
    docid order). vecs need not be normalized; they are normalized here."""
    n = len(ids)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    g = HnswGraph(ids, (vecs / norms[:, None]).astype(np.float64), m)
    if n == 0:
        return g
    ml = 1.0 / math.log(m)
    g.levels = np.array(
        [int(-math.log(_unit_interval(int(i))) * ml) for i in ids],
        dtype=np.int32)
    max_level = int(g.levels.max())
    g.neighbors = [[None] * n for _ in range(max_level + 1)]
    g.entry = 0
    for lev in range(g.levels[0] + 1):
        g.neighbors[lev][0] = []
    entry_level = int(g.levels[0])
    for node in range(1, n):
        node_level = int(g.levels[node])
        q = g.vecs[node]
        for lev in range(node_level + 1):
            g.neighbors[lev][node] = []
        eps = [g.entry]
        # greedy descent through levels above the node's
        for lev in range(entry_level, node_level, -1):
            ords, _ = _search_layer(g, q, eps, 1, lev)
            eps = [int(ords[0])]
        # ef_construction search + diverse linking at each level
        for lev in range(min(node_level, entry_level), -1, -1):
            ords, sims = _search_layer(g, q, eps, ef_construction, lev)
            sel = _diverse_select(g, ords, sims, m)
            g.neighbors[lev][node] = list(sel)
            max_conn = m * 2 if lev == 0 else m
            for nb in sel:
                lst = g.neighbors[lev][nb]
                lst.append(node)
                if len(lst) > max_conn:
                    # re-prune the neighbor's list with the same heuristic
                    arr = np.array(lst, dtype=np.int64)
                    ns = g.vecs[arr] @ g.vecs[nb]
                    order = np.lexsort((arr, -ns))
                    g.neighbors[lev][nb] = _diverse_select(
                        g, arr[order], ns[order], max_conn)
            eps = [int(o) for o in ords]
        if node_level > entry_level:
            g.entry = node
            entry_level = node_level
    return g


def search_hnsw_graph(g: HnswGraph, q: np.ndarray, k: int,
                      ef_search: int = 100):
    """One segment's KnnVectorQuery: greedy descent to level 0, ef_search
    beam there; exact-scan fallback when ef_search >= segment size
    (AbstractKnnVectorQuery.exactSearch semantics). Returns (vec_ids,
    cosines) sorted score desc, vec_id asc, <= k rows."""
    n = len(g.ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    if ef_search >= n:
        sims = g.vecs @ q
        order = np.lexsort((g.ids, -sims))[:k]
        return g.ids[order], sims[order]
    eps = [g.entry]
    for lev in range(g.top_level(), 0, -1):
        ords, _ = _search_layer(g, q, eps, 1, lev)
        eps = [int(ords[0])]
    ords, sims = _search_layer(g, q, eps, max(ef_search, k), 0)
    # ord order is insertion order == id order within the segment, so the
    # (score desc, ord asc) order of _search_layer is (score desc, id asc)
    return g.ids[ords[:k]], sims[:k]


def hnsw_top_k(vectors: DataFrame, queries: DataFrame, k: int = 10,
               m: int = 16, ef_construction: int = 100, ef_search: int = 100,
               n_segments: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "query_id",
               query_vec_col: str = "query_vec") -> DataFrame:
    """KnnVectorQuery over all query vectors at once: per-segment HNSW
    build + search inside applyInPandas, then a (score desc, vec_id asc)
    merge of the <= k * n_segments survivors.

    Returns (query_id, vec_id, cosine, rank). Approximate when
    ef_search < segment size; exact (brute-force fallback) otherwise.
    `n_segments` plays docs_per_segment's role: at 100 TB it bounds each
    build task's memory, and segment builds parallelize perfectly."""
    qpd = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpd[query_id_col].astype(np.int64).to_numpy()
    qvecs = np.array(qpd[query_vec_col].tolist(), dtype=np.float64)
    spark = vectors.sparkSession
    bq = spark.sparkContext.broadcast((qids, qvecs))

    def per_segment(key, pdf):
        ids = pdf[id_col].astype(np.int64).to_numpy()
        order = np.argsort(ids, kind="stable")  # insert in id order
        ids = ids[order]
        vecs = np.array(pdf[vec_col].to_numpy()[order].tolist(),
                        dtype=np.float64)
        g = build_hnsw_graph(ids, vecs, m=m, ef_construction=ef_construction)
        q_ids, q_vecs = bq.value
        out = []
        for qid, qv in zip(q_ids, q_vecs):
            vids, sims = search_hnsw_graph(g, qv, k, ef_search=ef_search)
            for v, s in zip(vids, sims):
                out.append((int(qid), int(v), float(s)))
        return pd.DataFrame(out,
                            columns=["query_id", "vec_id", "cosine"])

    seg = vectors.withColumn(
        "_seg", F.crc32(F.col(id_col).cast("string")) % n_segments)
    partials = seg.groupBy("_seg").applyInPandas(
        per_segment, "query_id long, vec_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))

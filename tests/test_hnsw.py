"""Per-segment HNSW KNN (Lucene 9.x KnnVectorQuery analog).

Pins: exact-scan fallback == brute force, graph-search recall, docid
tie-break on equal scores (LuceneDemo9.1.0 TieBreakDocIdKNNQuery.java),
determinism, and the multi-segment merge.
"""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.pipeline.hnsw import (
    build_hnsw_graph, hnsw_top_k, search_hnsw_graph)

RNG = np.random.RandomState(7)
N, DIM = 400, 16
VECS = RNG.randn(N, DIM)
IDS = np.arange(N, dtype=np.int64)


def _brute(q, k):
    v = VECS / np.linalg.norm(VECS, axis=1)[:, None]
    qn = q / np.linalg.norm(q)
    sims = v @ qn
    order = np.lexsort((IDS, -sims))[:k]
    return IDS[order], sims[order]


@pytest.fixture(scope="module")
def graph():
    return build_hnsw_graph(IDS, VECS, m=8, ef_construction=64)


def test_exact_fallback_matches_brute_force(graph):
    # ef_search >= n triggers AbstractKnnVectorQuery.exactSearch semantics
    for qi in range(5):
        q = RNG.randn(DIM)
        ids, sims = search_hnsw_graph(graph, q, k=10, ef_search=N)
        bids, bsims = _brute(q, 10)
        assert list(ids) == list(bids)
        np.testing.assert_allclose(sims, bsims, rtol=1e-12)


def test_graph_search_recall(graph):
    # moderate beam: recall@10 over 20 queries must be high on 400 vectors
    hits = total = 0
    rng = np.random.RandomState(11)
    for _ in range(20):
        q = rng.randn(DIM)
        ids, _ = search_hnsw_graph(graph, q, k=10, ef_search=64)
        bids, _ = _brute(q, 10)
        hits += len(set(ids) & set(bids))
        total += 10
    assert hits / total >= 0.9, f"recall {hits/total:.2f}"


def test_graph_search_deterministic(graph):
    q = np.full(DIM, 0.3)
    a = search_hnsw_graph(graph, q, k=10, ef_search=32)
    g2 = build_hnsw_graph(IDS, VECS, m=8, ef_construction=64)
    b = search_hnsw_graph(g2, q, k=10, ef_search=32)
    assert list(a[0]) == list(b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_tie_break_by_vec_id():
    # duplicate vectors: equal cosine must rank the smaller id first
    base = RNG.randn(8, DIM)
    vecs = np.vstack([base, base[0], base[0]])  # ids 8, 9 duplicate id 0
    ids = np.arange(10, dtype=np.int64)
    g = build_hnsw_graph(ids, vecs, m=4, ef_construction=32)
    out_ids, sims = search_hnsw_graph(g, base[0], k=3, ef_search=10)
    assert list(out_ids) == [0, 8, 9]
    assert sims[0] == sims[1] == sims[2]


def test_hnsw_top_k_dataframe(spark):
    rows = [(int(i), [float(x) for x in VECS[i]]) for i in range(N)]
    vdf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qrows = [(100 + j, [float(x) for x in RNG.randn(DIM)]) for j in range(3)]
    qdf = spark.createDataFrame(qrows, "query_id long, query_vec array<float>")
    out = hnsw_top_k(vdf, qdf, k=5, m=8, ef_construction=64,
                     ef_search=N, n_segments=4).toPandas()
    assert len(out) == 15
    assert list(out.columns) == ["query_id", "vec_id", "cosine", "rank"]
    # exact fallback in every segment -> merged result == global brute force
    # (float32 parquet round-trip of the vectors changes sims slightly, so
    # compare against brute force on the SAME float32-rounded vectors)
    v32 = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    for qid, qv in qrows:
        sub = out[out["query_id"] == qid].sort_values("rank")
        nv = v32 / np.linalg.norm(v32, axis=1)[:, None]
        q32 = np.array(qv, dtype=np.float32).astype(np.float64)
        sims = nv @ (q32 / np.linalg.norm(q32))
        order = np.lexsort((IDS, -sims))[:5]
        assert list(sub["vec_id"]) == list(IDS[order])

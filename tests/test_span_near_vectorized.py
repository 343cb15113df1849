"""Differential proof: vectorized 2-term NearSpans == faithful matchers.

kernel._near_2term_stream claims both NearSpansOrdered and the unordered
window queue collapse, for two distinct single-term clauses, to closed forms
over the two position streams. Exhaustive small-universe + randomized
corpora, ordered and unordered, float64 and float32, through the full
eval_spans path (candidates, accumulation order, freq fold included).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions import bm25, smallfloat
from lucene_7_x_9_x_spark.functions.codecs import encode_posting_list
from lucene_7_x_9_x_spark.search import kernel as K
from lucene_7_x_9_x_spark.search import query as Q


def _segment(docs_tokens):
    postings, norms = {}, {}
    for docid, toks in docs_tokens.items():
        norms[docid] = int(smallfloat.int_to_byte4([len(toks)])[0])
        per = {}
        for pos, t in enumerate(toks):
            per.setdefault(t, []).append(pos)
        for t, ps in per.items():
            postings.setdefault(t, []).append((docid, len(ps), ps))
    rows, gdf = {}, {}
    for t, lst in postings.items():
        lst.sort()
        d = np.array([x[0] for x in lst], dtype=np.int64)
        f = np.array([x[1] for x in lst], dtype=np.int64)
        nb = np.array([norms[x[0]] for x in lst], dtype=np.uint8)
        ps = [np.array(x[2], dtype=np.int64) for x in lst]
        rows[t] = {"df": int(d.size), "ttf": int(f.sum()),
                   "blocks": encode_posting_list(d, f, nb, ps)}
        gdf[t] = int(d.size)
    return K.SegmentIndex(rows, max(docs_tokens) + 1), gdf


def _docs_from_positions(per_doc):
    """per_doc: {docid: (positions_of_a, positions_of_b)} -> token lists."""
    docs = {}
    for docid, (pa, pb) in per_doc.items():
        n = max(list(pa) + list(pb), default=0) + 1
        toks = [f"f{i}" for i in range(n)]  # unique fillers, never match
        for p in pa:
            toks[p] = "a"
        for p in pb:
            toks[p] = "b"
        docs[docid] = toks
    return docs


def _run(per_doc, slop, in_order, dtype, vectorized):
    docs = _docs_from_positions(per_doc)
    seg, gdf = _segment(docs)
    sc = K.Scorer(seg, bm25.BM25Stats(len(docs), 40 * len(docs),
                                      dtype=dtype), gdf)
    sc.dtype = dtype
    sc.span_near_2term_vectorized = vectorized
    q = Q.SpanNearQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("b")),
                        slop=slop, in_order=in_order)
    d, f = sc.eval_spans(q)
    return dict(zip(d.tolist(), f.tolist()))


def _check(per_doc, slop, in_order, dtype=np.float64):
    got = _run(per_doc, slop, in_order, dtype, True)
    want = _run(per_doc, slop, in_order, dtype, False)
    assert got == want, (per_doc, slop, in_order, got, want)


def test_exhaustive_small_universe():
    """Disjoint A/B position subsets of 0..5 (terms occupy distinct slots),
    both orders, slops 0..4 — covers adjacency, exhaustion, reuse."""
    idx = list(range(6))
    for r_a in range(1, 4):
        for pa in itertools.combinations(idx, r_a):
            rest = [i for i in idx if i not in pa]
            for r_b in range(1, 4):
                for pb in itertools.combinations(rest, r_b):
                    per_doc = {5: (list(pa), list(pb))}
                    for slop in range(5):
                        _check(per_doc, slop, True)
                        _check(per_doc, slop, False)


@pytest.mark.parametrize("seed", range(10))
def test_randomized_multi_doc(seed):
    rng = np.random.default_rng(seed)
    per_doc = {}
    for doc in range(int(rng.integers(2, 8))):
        n = int(rng.integers(10, 120))
        slots = rng.permutation(n)
        na, nb = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        per_doc[doc * 2] = (sorted(slots[:na].tolist()),
                            sorted(slots[na:na + nb].tolist()))
    for slop in (0, 1, 3, 7):
        for in_order in (True, False):
            _check(per_doc, slop, in_order)
            _check(per_doc, slop, in_order, dtype=np.float32)


def test_fallback_paths_still_used():
    """Same-term clauses and 3-clause queries keep the faithful matcher."""
    per_doc = {0: ([0, 2], [1, 3])}
    docs = _docs_from_positions(per_doc)
    seg, gdf = _segment(docs)
    sc = K.Scorer(seg, bm25.BM25Stats(1, 40, dtype=np.float64), gdf)
    q_same = Q.SpanNearQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("a")),
                             slop=2, in_order=True)
    d, f = sc.eval_spans(q_same)  # must not raise; faithful path
    assert d.size >= 0
    q3 = Q.SpanNearQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("b"),
                          Q.SpanTermQuery("a")), slop=4, in_order=True)
    d3, _ = sc.eval_spans(q3)
    assert d3.size >= 0

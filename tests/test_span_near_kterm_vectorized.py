"""Differential proof: vectorized k-term NearSpans == faithful matchers.

kernel._near_kterm_stream claims NearSpansOrdered collapses, for k >= 3
distinct single-term clauses, to a chained first-landing-spot searchsorted
(monotone pointers == independent per-start chains), and the unordered
window queue to merged-pop-order emissions cut at the doc's earliest clause
exhaustion event. Exhaustive 3-term small-universe + randomized k in 3..5,
ordered and unordered, float64 and float32, through the full eval_spans path
(candidates, window cut, accumulation order, freq fold included).
"""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions import bm25, smallfloat
from lucene_7_x_9_x_spark.functions.codecs import encode_posting_list
from lucene_7_x_9_x_spark.search import kernel as K
from lucene_7_x_9_x_spark.search import query as Q

TERMS = [f"t{j}" for j in range(8)]


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


def _docs_from_positions(per_doc, k):
    """per_doc: {docid: [positions_of_t0, ..., positions_of_tk-1]}."""
    docs = {}
    for docid, pls in per_doc.items():
        n = max((p for ps in pls for p in ps), default=0) + 1
        toks = [f"f{i}" for i in range(n)]
        for j, ps in enumerate(pls):
            for p in ps:
                toks[p] = TERMS[j]
        docs[docid] = toks
    return docs


def _run(per_doc, k, slop, in_order, dtype, vectorized):
    docs = _docs_from_positions(per_doc, k)
    seg, gdf = _segment(docs)
    sc = K.Scorer(seg, bm25.BM25Stats(len(docs), 40 * len(docs),
                                      dtype=dtype), gdf)
    sc.dtype = dtype
    sc.span_near_kterm_vectorized = vectorized
    q = Q.SpanNearQuery(tuple(Q.SpanTermQuery(t) for t in TERMS[:k]),
                        slop=slop, in_order=in_order)
    d, f = sc.eval_spans(q)
    return dict(zip(d.tolist(), f.tolist()))


def _check(per_doc, k, slop, in_order, dtype=np.float64):
    got = _run(per_doc, k, slop, in_order, dtype, True)
    want = _run(per_doc, k, slop, in_order, dtype, False)
    assert got == want, (per_doc, k, slop, in_order, got, want)


def test_exhaustive_small_universe_3term():
    """Every disjoint (A, B, C) split of slots 0..5, both orders, slops
    0..4 — covers pop-order ties, exhaustion cuts, chained landing spots."""
    idx = list(range(6))
    for ra in range(1, 4):
        for pa in itertools.combinations(idx, ra):
            r1 = [i for i in idx if i not in pa]
            for rb in range(1, 4):
                for pb in itertools.combinations(r1, rb):
                    r2 = [i for i in r1 if i not in pb]
                    for rc in range(1, 3):
                        for pc in itertools.combinations(r2, rc):
                            pd = {5: [list(pa), list(pb), list(pc)]}
                            for slop in range(5):
                                _check(pd, 3, slop, True)
                                _check(pd, 3, slop, False)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("k", [3, 4, 5])
def test_randomized_multidoc(k, dtype):
    rng = random.Random(777 + k)
    for trial in range(30):
        per_doc = {}
        for doc in range(rng.randint(1, 5)):
            # sample disjoint slot sets per term (terms occupy token slots)
            slots = list(range(30))
            rng.shuffle(slots)
            pls, at = [], 0
            for j in range(k):
                m = rng.randint(1, 4)
                pls.append(sorted(slots[at:at + m]))
                at += m
            per_doc[doc * 2] = pls
        for slop in (0, 1, 2, 4, 9, 40):
            for in_order in (True, False):
                _check(per_doc, k, slop, in_order, dtype)


def test_exhaustion_mid_doc_unordered():
    """A clause with one early position: pops after its exhaustion event
    must not emit (the k=2 shortcut would over-emit here)."""
    _check({1: [[1], [2], [0, 5]]}, 3, 3, False)
    _check({1: [[0], [10], [1, 2, 3]]}, 3, 50, False)
    _check({1: [[5], [6], [0]]}, 3, 50, False)


def test_clause_missing_in_doc():
    per_doc = {1: [[0, 3], [1], []], 2: [[0], [1], [2]]}
    _check(per_doc, 3, 4, True)
    _check(per_doc, 3, 4, False)

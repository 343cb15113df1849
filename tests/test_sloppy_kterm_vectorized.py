"""Differential proof: the vectorized k-term sloppy walk == faithful matcher.

kernel._sloppy_counts_kterm claims the greedy of SloppyPhraseMatcher.java
(ported faithfully in search/sloppy.py) collapses, for k >= 3 distinct
single-term PhrasePositions, to a k-stream leapfrog: pop the least phrase
position, jump it past the second-least, emit end - (last position <= the
second-least) when within slop. These tests pin the equivalence exhaustively
on a small 3-term position universe (every disjoint triple of subsets, every
slop — covers all tie/exhaustion orders) and on randomized k in 3..5 with
OVERLAPPING phrase-position streams (terms at distinct token slots still
collide after the -offset shift), in float64 and float32, multi-doc.

No Spark: the kernel path is exercised through a stub segment.
"""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest

from lucene_7_x_9_x_spark.search.kernel import Scorer
from lucene_7_x_9_x_spark.search.sloppy import SloppyPhraseMatcher

TERMS = [f"t{j}" for j in range(8)]


class _StubSeg:
    """flat_positions-only segment stub: docs -> {term: sorted positions}."""

    def __init__(self, docs: dict):
        self.docs = docs

    def flat_positions(self, term):
        dd, pp = [], []
        for doc in sorted(self.docs):
            ps = self.docs[doc].get(term, ())
            dd.extend([doc] * len(ps))
            pp.extend(ps)
        return (np.asarray(dd, dtype=np.int64),
                np.asarray(pp, dtype=np.int64))


def _vectorized(docs: dict, slop: int, k: int, dtype):
    sc = object.__new__(Scorer)
    sc.seg = _StubSeg(docs)
    sc.dtype = dtype
    terms = TERMS[:k]
    cand = np.asarray(
        [d for d in sorted(docs) if all(docs[d].get(t) for t in terms)],
        dtype=np.int64)
    if cand.size == 0:
        return {}
    d, f = sc._sloppy_counts_kterm(cand, slop, terms)
    return dict(zip(d.tolist(), f.tolist()))


def _faithful(docs: dict, slop: int, k: int, dtype):
    acc_dt = np.float32 if dtype == np.float32 else np.float64
    terms = TERMS[:k]
    out = {}
    for doc in sorted(docs):
        pls = [docs[doc].get(t) for t in terms]
        if any(not p for p in pls):
            continue
        m = SloppyPhraseMatcher(list(range(k)), [(t,) for t in terms], slop)
        f = m.freq([np.asarray(p, dtype=np.int64) for p in pls],
                   dtype=acc_dt)
        if f > 0:
            out[doc] = f
    return out


def _check(docs: dict, slop: int, k: int, dtype=np.float64):
    got = _vectorized(docs, slop, k, dtype)
    want = _faithful(docs, slop, k, dtype)
    assert got.keys() == want.keys(), (docs, slop, got, want)
    for key in want:
        # identical accumulation order and dtype -> bit-equal
        assert got[key] == want[key], (docs, slop, key, got[key], want[key])


def test_exhaustive_small_universe_3term():
    """Every disjoint (A, B, C) split of token slots 0..5, slops 0..4:
    covers all pop orderings, cross-stream phrase-position ties (slot p of
    term j is phrase position p-j), immediate exhaustion, no-match docs."""
    idx = list(range(6))
    n = 0
    for ra in range(1, 4):
        for pa in itertools.combinations(idx, ra):
            r1 = [i for i in idx if i not in pa]
            for rb in range(1, 4):
                for pb in itertools.combinations(r1, rb):
                    r2 = [i for i in r1 if i not in pb]
                    for rc in range(1, 3):
                        for pc in itertools.combinations(r2, rc):
                            # positions are per-term ACTUAL token slots; the
                            # matcher shifts by offset internally
                            docs = {7: {"t0": list(pa), "t1": list(pb),
                                        "t2": list(pc)}}
                            for slop in range(5):
                                _check(docs, slop, 3)
                            n += 1
    assert n > 200


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("k", [3, 4, 5])
def test_randomized_multidoc(k, dtype):
    rng = random.Random(1234 + k)
    for trial in range(40):
        docs = {}
        for doc in range(rng.randint(1, 6)):
            per = {}
            for j in range(k):
                m = rng.randint(0, 5)
                per[TERMS[j]] = sorted(rng.sample(range(40), m)) if m else []
            docs[doc * 3 + 1] = per
        for slop in (0, 1, 2, 4, 8, 50):
            _check(docs, slop, k, dtype)


def test_dense_collision_heavy():
    """Many phrase-position ties: all terms on a tight grid."""
    rng = random.Random(99)
    for trial in range(30):
        per = {t: sorted(rng.sample(range(10), rng.randint(1, 6)))
               for t in TERMS[:4]}
        for slop in range(6):
            _check({1: per}, slop, 4)
            _check({1: per}, slop, 4, np.float32)


def test_through_phrase_freqs_route():
    """End-to-end via the Scorer routing (gates: k>=3, distinct terms)."""
    from lucene_7_x_9_x_spark.functions import bm25, smallfloat
    from lucene_7_x_9_x_spark.functions.codecs import encode_posting_list
    from lucene_7_x_9_x_spark.search import kernel as K
    from lucene_7_x_9_x_spark.search import query as Q

    docs_tokens = {
        0: ["a", "x", "b", "c", "x", "a", "b", "x", "c"],
        1: ["c", "b", "a", "x", "a", "b", "c"],
        2: ["a", "b", "x", "x", "x", "x", "c"],
        3: ["a", "b"],
    }
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
    seg = K.SegmentIndex(rows, max(docs_tokens) + 1)
    for slop in (1, 2, 3, 6):
        q = Q.PhraseQuery(("a", "b", "c"), slop=slop)
        res = {}
        for vec in (True, False):
            sc = K.Scorer(seg, bm25.BM25Stats(4, 30, dtype=np.float32), gdf)
            sc.dtype = np.float32
            sc.sloppy_kterm_vectorized = vec
            d, f = sc._phrase_freqs(q)
            res[vec] = dict(zip(d.tolist(), f.tolist()))
        assert res[True] == res[False], (slop, res)


def test_multiphrase_union_slots_route():
    """MultiPhraseQuery with no term repeated across slots routes through
    the k-stream walk over unioned slot streams — must equal the faithful
    per-doc matcher (which unions the same lists)."""
    from lucene_7_x_9_x_spark.functions import bm25, smallfloat
    from lucene_7_x_9_x_spark.functions.codecs import encode_posting_list
    from lucene_7_x_9_x_spark.search import kernel as K
    from lucene_7_x_9_x_spark.search import query as Q

    rng = random.Random(4242)
    docs_tokens = {}
    vocab = ["a1", "a2", "b1", "c1", "c2", "x", "y", "z"]
    for doc in range(12):
        docs_tokens[doc] = [rng.choice(vocab) for _ in range(30)]
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
    seg = K.SegmentIndex(rows, len(docs_tokens))
    for slots in ((("a1", "a2"), ("b1",), ("c1", "c2")),
                  (("a1",), ("b1", "c2")),
                  (("a1", "x"), ("b1", "y"), ("c1",), ("z",))):
        for slop in (0, 1, 2, 4, 9):
            if slop == 0:
                continue  # exact path is shared; walk only runs slop > 0
            q = Q.MultiPhraseQuery(slots, slop=slop)
            res = {}
            for vec in (True, False):
                sc = K.Scorer(seg, bm25.BM25Stats(12, 360,
                                                  dtype=np.float32), gdf)
                sc.dtype = np.float32
                sc.sloppy_kterm_vectorized = vec
                d, f = sc._multi_phrase_freqs(q)
                res[vec] = dict(zip(d.tolist(), f.tolist()))
            assert res[True] == res[False], (slots, slop, res)

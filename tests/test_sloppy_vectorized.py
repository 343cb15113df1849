"""Differential proof: the vectorized 2-term sloppy walk == faithful matcher.

kernel._sloppy_counts_2term claims the greedy of SloppyPhraseMatcher.java
(ported faithfully in search/sloppy.py) collapses, for exactly two distinct
single-term PhrasePositions, to an alternating leapfrog walk. These tests pin
that equivalence exhaustively on a small position universe (every subset pair,
every slop — covers all tie/exhaustion orders) and on randomized large lists,
in both float64 and float32 accumulation, single- and multi-doc.

No Spark: the kernel path is exercised through a stub segment.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lucene_7_x_9_x_spark.search.kernel import Scorer
from lucene_7_x_9_x_spark.search.sloppy import SloppyPhraseMatcher


class _StubSeg:
    """flat_positions-only segment stub: docs -> {term: sorted positions}."""

    def __init__(self, docs: dict):
        self.docs = docs  # {docid: {term: [pos, ...]}}

    def flat_positions(self, term):
        dd, pp = [], []
        for doc in sorted(self.docs):
            ps = self.docs[doc].get(term, ())
            dd.extend([doc] * len(ps))
            pp.extend(ps)
        return (np.asarray(dd, dtype=np.int64),
                np.asarray(pp, dtype=np.int64))


def _vectorized(docs: dict, slop: int, dtype):
    sc = object.__new__(Scorer)
    sc.seg = _StubSeg(docs)
    sc.dtype = dtype
    cand = np.asarray(
        [d for d in sorted(docs) if docs[d].get("a") and docs[d].get("b")],
        dtype=np.int64)
    if cand.size == 0:
        return {}
    d, f = sc._sloppy_counts_2term(cand, slop, "a", "b")
    return dict(zip(d.tolist(), f.tolist()))


def _faithful(docs: dict, slop: int, dtype):
    acc_dt = np.float32 if dtype == np.float32 else np.float64
    out = {}
    for doc in sorted(docs):
        pa, pb = docs[doc].get("a"), docs[doc].get("b")
        if not pa or not pb:
            continue
        m = SloppyPhraseMatcher([0, 1], [("a",), ("b",)], slop)
        f = m.freq([np.asarray(pa, dtype=np.int64),
                    np.asarray(pb, dtype=np.int64)], dtype=acc_dt)
        if f > 0:
            out[doc] = f
    return out


def _check(docs: dict, slop: int, dtype=np.float64):
    got = _vectorized(docs, slop, dtype)
    want = _faithful(docs, slop, dtype)
    assert got.keys() == want.keys(), (docs, slop, got, want)
    for k in want:
        # identical accumulation order and dtype -> bit-equal
        assert got[k] == want[k], (docs, slop, k, got[k], want[k])


def test_exhaustive_small_universe():
    """Every (subset A, subset B) of positions 0..5, slops 0..4: covers all
    orderings, cross-stream ties, immediate exhaustion, and no-match docs."""
    subsets = [list(c) for r in range(1, 7)
               for c in itertools.combinations(range(6), r)]
    for pa in subsets:
        for pb in subsets:
            docs = {7: {"a": pa, "b": pb}}
            for slop in range(5):
                _check(docs, slop)


def test_exhaustive_float32_slice():
    subsets = [list(c) for r in range(1, 5)
               for c in itertools.combinations(range(5), r)]
    for pa in subsets:
        for pb in subsets:
            _check({3: {"a": pa, "b": pb}}, 2, dtype=np.float32)


@pytest.mark.parametrize("seed", range(12))
def test_randomized_large(seed):
    rng = np.random.default_rng(seed)
    docs = {}
    for doc in range(int(rng.integers(1, 9))):
        na, nb = int(rng.integers(1, 41)), int(rng.integers(1, 41))
        docs[doc * 3] = {
            "a": sorted(rng.choice(300, size=na, replace=False).tolist()),
            "b": sorted(rng.choice(300, size=nb, replace=False).tolist()),
        }
    for slop in (1, 2, 5, 8):
        _check(docs, slop)
        _check(docs, slop, dtype=np.float32)


def test_multi_doc_mixed_with_missing_terms():
    docs = {
        0: {"a": [0, 4, 9], "b": [1, 5]},
        1: {"a": [2]},                      # missing b -> not a candidate
        5: {"a": [0], "b": [100]},          # match only at huge slop
        9: {"a": [3, 3 + 1], "b": [4, 5]},  # adjacent hits
    }
    for slop in (0, 1, 2, 99):
        _check(docs, slop)
        _check(docs, slop, dtype=np.float32)

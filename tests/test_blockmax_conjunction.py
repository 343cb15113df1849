"""Block-max conjunction / dismax pruning: differential (pruned == exhaustive)
plus evidence that the pruned paths actually SKIP chunks once θ is competitive
(BlockMaxConjunctionScorer.java:30,44; Boolean2ScorerSupplier.java:173)."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions import bm25, codecs, smallfloat
from lucene_7_x_9_x_spark.search import kernel as K
from lucene_7_x_9_x_spark.search import query as Q


def _make_segment(seed=0, max_doc=40_000, terms=("alpha", "beta", "gamma")):
    """Multi-chunk synthetic segment with skewed freq distributions so some
    chunks clearly dominate the bounds."""
    rng = np.random.RandomState(seed)
    rows = {}
    norms = smallfloat.int_to_byte4(
        rng.randint(5, 200, max_doc).astype(np.int64))
    for ti, t in enumerate(terms):
        df = [12_000, 9_000, 5_000][ti % 3]
        docids = np.sort(rng.choice(max_doc, df, replace=False)).astype(np.int64)
        freqs = rng.randint(1, 4, df).astype(np.int64)
        # spike one region per term so chunk bounds differ strongly
        hot = (docids // 4096) == (3 * ti) % 9
        freqs[hot] += 40
        blocks = codecs.encode_posting_list(docids, freqs, norms[docids])
        rows[t] = {"df": df, "ttf": int(freqs.sum()), "blocks": blocks}
    seg = K.SegmentIndex(rows, max_doc)
    stats = bm25.BM25Stats(max_doc, int(norms.astype(np.int64).sum()) * 50,
                           dtype=np.float32)
    gdf = {t: rows[t]["df"] for t in terms}
    return seg, stats, gdf


QUERIES = [
    Q.BooleanQuery(must=(Q.TermQuery("alpha"), Q.TermQuery("beta"))),
    Q.BooleanQuery(must=(Q.TermQuery("alpha"), Q.TermQuery("beta"),
                         Q.TermQuery("gamma"))),
    Q.BooleanQuery(must=(Q.TermQuery("alpha", 2.0),),
                   should=(Q.TermQuery("gamma", 0.5),)),
    Q.DisjunctionMaxQuery((Q.TermQuery("alpha"), Q.TermQuery("gamma")),
                          tie_breaker=0.3),
    Q.DisjunctionMaxQuery((Q.TermQuery("alpha"), Q.TermQuery("beta"),
                           Q.TermQuery("gamma")), tie_breaker=0.0),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_pruned_equals_exhaustive(qi):
    q = QUERIES[qi]
    seg, stats, gdf = _make_segment()
    dp, sp, hp, ep = K.segment_top_k(seg, stats, gdf, q, 10, pruning=True)
    seg2, stats2, gdf2 = _make_segment()
    de, se, he, ee = K.segment_top_k(seg2, stats2, gdf2, q, 10, pruning=False)
    assert (dp == de).all()
    assert (sp == se).all()
    if ep:
        assert hp == he


@pytest.mark.parametrize("qi", [0, 2, 3])
def test_pruning_skips_chunks(qi):
    q = QUERIES[qi]
    seg, stats, gdf = _make_segment()
    counters: dict = {}
    K.segment_top_k(seg, stats, gdf, q, 5, pruning=True,
                    total_hits_threshold=100, counters=counters)
    assert counters["chunks_total"] > 0
    assert counters["chunks_visited"] < counters["chunks_total"], q


def test_conjunction_routing():
    assert K._flat_term_conjunction(QUERIES[0]) is not None
    assert K._flat_term_dismax(QUERIES[3]) is not None
    # not eligible: must_not present, msm>0, non-term clause
    assert K._flat_term_conjunction(Q.BooleanQuery(
        must=(Q.TermQuery("a"),), must_not=(Q.TermQuery("b"),))) is None
    assert K._flat_term_conjunction(Q.BooleanQuery(
        must=(Q.PhraseQuery(("a", "b")),))) is None
    assert K._flat_term_conjunction(Q.BooleanQuery(
        must=(Q.TermQuery("a"),), should=(Q.TermQuery("b"),),
        minimum_should_match=1)) is None

"""Spans family: SpanTerm/Near/Or/Not/First position algebra + scoring."""

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

ROWS = [
    (0, "alpha beta gamma delta"),
    (1, "beta alpha gamma"),
    (2, "alpha filler filler beta"),
    (3, "gamma delta alpha"),
    (4, "alpha beta alpha beta"),
    (5, "unrelated words only"),
]


@pytest.fixture()
def searcher(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(ROWS, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=3, int_keys=True,
                term_shards=4)
    return IndexSearcher(spark, d)


def _keys(td):
    return sorted(int(k) for k in td.hits["key"])


def test_span_near_ordered_adjacent(spark, searcher):
    q = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
                        slop=0, in_order=True)
    assert _keys(searcher.search(q, k=10)) == [0, 4]


def test_span_near_ordered_with_slop(spark, searcher):
    q = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
                        slop=2, in_order=True)
    # doc 2: alpha ... (2 fillers) ... beta -> slack 2
    assert _keys(searcher.search(q, k=10)) == [0, 2, 4]


def test_span_near_unordered(spark, searcher):
    q = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
                        slop=0, in_order=False)
    # doc 1: 'beta alpha' adjacent but reversed
    assert _keys(searcher.search(q, k=10)) == [0, 1, 4]


def test_span_near_freq_counts_spans(spark, searcher):
    q = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
                        slop=0, in_order=True)
    td = searcher.search(q, k=10)
    # doc 4 has two adjacent alpha-beta pairs -> more matches -> higher score
    assert int(td.hits.iloc[0]["key"]) == 4


def test_span_first(spark, searcher):
    q = Q.SpanFirstQuery(Q.SpanTermQuery("beta"), end=2)
    # beta within first 2 positions: docs 0 (pos1), 1 (pos0), 4 (pos1)
    assert _keys(searcher.search(q, k=10)) == [0, 1, 4]


def test_span_not(spark, searcher):
    near = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
                           slop=2, in_order=True)
    # exclude any alpha-beta span overlapping 'filler'
    q = Q.SpanNotQuery(near, Q.SpanTermQuery("filler"))
    assert _keys(searcher.search(q, k=10)) == [0, 4]


def test_span_or(spark, searcher):
    q = Q.SpanOrQuery((Q.SpanTermQuery("delta"), Q.SpanTermQuery("unrelated")))
    assert _keys(searcher.search(q, k=10)) == [0, 3, 5]


def test_span_inside_boolean(spark, searcher):
    near = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
                           slop=0, in_order=True)
    q = Q.BooleanQuery(must=(near,), must_not=(Q.TermQuery("gamma"),))
    assert _keys(searcher.search(q, k=10)) == [4]


def test_span_containing(spark, searcher):
    # alpha..delta spans that contain a 'beta': doc 0 (alpha beta gamma delta)
    big = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("delta")),
                          slop=3, in_order=True)
    q = Q.SpanContainingQuery(big, Q.SpanTermQuery("beta"))
    assert _keys(searcher.search(q, k=10)) == [0]
    # containing 'gamma': docs 0 only (doc 3 has gamma BEFORE alpha..delta?
    # doc 3 = 'gamma delta alpha': no alpha..delta span at all)
    q2 = Q.SpanContainingQuery(big, Q.SpanTermQuery("gamma"))
    assert _keys(searcher.search(q2, k=10)) == [0]


def test_span_within(spark, searcher):
    big = Q.SpanNearQuery((Q.SpanTermQuery("alpha"), Q.SpanTermQuery("delta")),
                          slop=3, in_order=True)
    q = Q.SpanWithinQuery(big, Q.SpanTermQuery("beta"))
    assert _keys(searcher.search(q, k=10)) == [0]
    # beta outside any big span (docs 1, 2, 4 have no alpha..delta span)
    assert searcher.count(q) == 1


def test_span_position_range(spark, searcher):
    # beta with start >= 1 and end <= 2 -> position 1 exactly: docs 0, 4
    q = Q.SpanPositionRangeQuery(Q.SpanTermQuery("beta"), start=1, end=2)
    assert _keys(searcher.search(q, k=10)) == [0, 4]
    # gamma in [2, 4): docs 0 (pos 2), 1 (pos 2)
    q2 = Q.SpanPositionRangeQuery(Q.SpanTermQuery("gamma"), start=2, end=4)
    assert _keys(searcher.search(q2, k=10)) == [0, 1]


def test_near_ordered_monotonic_pointer_semantics(spark, tmp_path):
    """NearSpansOrdered javadoc example: 't1 t2 t1 t3 t2 t3' with slop>=1
    matches 't1 t2 .. t3' and 't1 .. t2 t3' (two matches)."""
    d = str(tmp_path / "idx2")
    rows = [(0, "t1 t2 t1 t3 t2 t3"), (1, "t1 t2 t3")]
    build_index(spark, spark.createDataFrame(rows, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=4, int_keys=True,
                term_shards=2)
    s = IndexSearcher(spark, d)
    q = Q.SpanNearQuery((Q.SpanTermQuery("t1"), Q.SpanTermQuery("t2"),
                         Q.SpanTermQuery("t3")), slop=1, in_order=True)
    td = s.search(q, k=10)
    assert _keys(td) == [0, 1]
    # kernel-level: doc 0 must yield exactly the two javadoc matches
    from lucene_7_x_9_x_spark.search import kernel as K
    per = [[(0, 1, 0), (2, 3, 0)], [(1, 2, 0), (4, 5, 0)], [(3, 4, 0), (5, 6, 0)]]
    spans = K.Scorer._near_ordered(per, 1)
    assert [(s0, e0) for s0, e0, _ in spans] == [(0, 4), (2, 6)]
    assert [w for _, _, w in spans] == [1, 1]
    # slop=0 -> only the unbroken 't1 t2 t3' run in doc 1
    q0 = Q.SpanNearQuery((Q.SpanTermQuery("t1"), Q.SpanTermQuery("t2"),
                          Q.SpanTermQuery("t3")), slop=0, in_order=True)
    assert _keys(s.search(q0, k=10)) == [1]


def test_near_unordered_window_semantics():
    """NearSpansUnordered window: overlapping sub-spans allowed; width =
    maxEnd - top.start."""
    from lucene_7_x_9_x_spark.search import kernel as K
    # clauses at positions a=[0, 10], b=[1]
    per = [[(0, 1, 0), (10, 11, 0)], [(1, 2, 0)]]
    spans = K.Scorer._near_unordered(per, 0)
    assert spans == [(0, 2, 2)]
    # overlap: same position term spans (via or-clauses) still match
    per2 = [[(3, 4, 0)], [(3, 4, 0)]]
    spans2 = K.Scorer._near_unordered(per2, 5)
    # window (3,4)+(3,4): maxEnd - top.start - totalLen = 4-3-2 = -1 <= slop
    assert len(spans2) >= 1

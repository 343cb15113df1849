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

"""Surround query language (search/surround.py) vs the reference
queryparser/surround module: W/N distance operators (infix + prefix,
default distance 1, SpanNear slop = distance-1, DistanceQuery.java:106),
AND/OR/NOT booleans, truncation inside distance ops, and the
distanceSubQueryNotAllowed guard."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher
from lucene_7_x_9_x_spark.search.surround import parse_surround


# --- pure parser mappings ---------------------------------------------------

def test_infix_w_default_distance():
    q = parse_surround("spark w merge")
    assert q == Q.SpanNearQuery(
        (Q.SpanTermQuery("spark"), Q.SpanTermQuery("merge")),
        slop=0, in_order=True)


def test_infix_numbered_n_unordered():
    q = parse_surround("spark 4N merge")
    assert q == Q.SpanNearQuery(
        (Q.SpanTermQuery("spark"), Q.SpanTermQuery("merge")),
        slop=3, in_order=False)


def test_infix_chain_folds_like_prefix_form():
    assert parse_surround("a 2w b 2w c") == parse_surround("2W(a, b, c)")
    q = parse_surround("2W(a, b, c)")
    assert len(q.clauses) == 3 and q.slop == 1 and q.in_order


def test_mixed_distance_ops_nest():
    q = parse_surround("a w b n c")
    assert isinstance(q, Q.SpanNearQuery) and not q.in_order
    assert isinstance(q.clauses[0], Q.SpanNearQuery)
    assert q.clauses[0].in_order


def test_boolean_forms():
    q = parse_surround("spark AND merge")
    assert q == Q.BooleanQuery(must=(Q.TermQuery("spark"),
                                     Q.TermQuery("merge")))
    q = parse_surround("OR(spark, merge)")
    assert set(q.should) == {Q.TermQuery("spark"), Q.TermQuery("merge")}
    q = parse_surround("spark NOT merge")
    assert q == Q.BooleanQuery(must=(Q.TermQuery("spark"),),
                               must_not=(Q.TermQuery("merge"),))
    # span operands DO compose as SpanNot (exclusion stays positional)
    q = parse_surround("(spark w fast) NOT (slow w merge)")
    assert isinstance(q, Q.SpanNotQuery)


def test_or_inside_distance_becomes_span_or():
    q = parse_surround("(spark OR fast) w merge")
    assert isinstance(q.clauses[0], Q.SpanOrQuery)


def test_truncation_inside_distance_wraps():
    q = parse_surround("spar* w merge")
    assert isinstance(q.clauses[0], Q.SpanMultiTermQueryWrapper)
    assert q.clauses[0].query == Q.WildcardQuery("spar*")


def test_and_inside_distance_rejected():
    with pytest.raises(ValueError):
        parse_surround("(spark AND fast) w merge")


def test_operators_case_insensitive():
    assert parse_surround("a 3w b") == parse_surround("a 3W b")
    assert parse_surround("a and b") == parse_surround("a AND b")


# --- end-to-end -------------------------------------------------------------

DOCS = [
    (0, "spark fast merge sort"),
    (1, "spark slow slow slow merge"),
    (2, "merge then spark"),
    (3, "spark merge spark merge"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("surroundidx") / "idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=2,
                int_keys=True, term_shards=2)
    return d


def test_surround_equals_direct_span(spark, idx):
    s = IndexSearcher(spark, idx, dtype=np.float64)
    got = s.search(parse_surround("spark 2w merge"), k=10).hits
    want = s.search(Q.SpanNearQuery(
        (Q.SpanTermQuery("spark"), Q.SpanTermQuery("merge")),
        slop=1, in_order=True), k=10).hits
    assert list(got["key"]) == list(want["key"])
    assert list(got["score"]) == list(want["score"])
    # ordered distance 2: docs 0 (gap 1), 3 (adjacent) match; 1 (gap 3) and
    # 2 (wrong order) do not
    assert set(got["key"]) == {"0", "3"}

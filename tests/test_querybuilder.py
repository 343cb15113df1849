"""QueryBuilder analog construction semantics (util/QueryBuilder.java; demo
lucene/query/QueryBuilderTest.java). Pure query-tree assertions — execution
of the built queries is pinned by the `querybuilder_topk` contract entry."""

from lucene_7_x_9_x_spark.analysis.tokenizer import Analyzer, ENGLISH
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.querybuilder import (
    create_boolean_query, create_min_should_match_query, create_phrase_query)


def test_single_token_is_term_query():
    q = create_boolean_query("Spark", "should")
    assert q == Q.TermQuery("spark")


def test_empty_text_is_match_no_docs():
    assert isinstance(create_boolean_query("", "should"), Q.MatchNoDocsQuery)
    assert isinstance(create_phrase_query(""), Q.MatchNoDocsQuery)


def test_should_and_must_operators():
    qs = create_boolean_query("fast sort", "should")
    assert qs == Q.BooleanQuery(
        should=(Q.TermQuery("fast"), Q.TermQuery("sort")))
    qm = create_boolean_query("fast sort", "must")
    assert qm == Q.BooleanQuery(
        must=(Q.TermQuery("fast"), Q.TermQuery("sort")))


def test_invalid_operator_raises():
    import pytest
    with pytest.raises(ValueError):
        create_boolean_query("fast sort", "must_not")


def test_phrase_query_gapless():
    q = create_phrase_query("fast merge sort", slop=1)
    assert q == Q.PhraseQuery(("fast", "merge", "sort"), slop=1)


def test_phrase_query_stopword_hole_widens_slop():
    # ENGLISH drops 'the' leaving a position hole between 'fast' and 'sort';
    # QueryBuilder.analyzePhrase keeps increments -> effective slop grows by 1
    q = create_phrase_query("fast the sort", analyzer=ENGLISH)
    assert isinstance(q, Q.PhraseQuery)
    assert q.terms == ("fast", "sort")
    assert q.slop == 1


def test_min_should_match_fraction():
    q = create_min_should_match_query("sort hash scan", 0.7)
    assert isinstance(q, Q.BooleanQuery)
    assert len(q.should) == 3
    assert q.minimum_should_match == 2  # int(0.7 * 3)


def test_min_should_match_out_of_range_fraction_is_plain_should():
    for frac in (0.0, 1.0, -0.5, 2.0):
        q = create_min_should_match_query("sort hash scan", frac)
        assert q.minimum_should_match == 0
    # fraction too small to reach one clause -> no constraint
    q = create_min_should_match_query("sort hash", 0.2)  # int(0.4) = 0
    assert q.minimum_should_match == 0


def test_analyzed_terms_run_the_index_analyzer():
    # stemming analyzer: built clauses carry the STEMS the index stores
    q = create_boolean_query("merging tables", "should", analyzer=ENGLISH)
    assert q == Q.BooleanQuery(
        should=(Q.TermQuery("merg"), Q.TermQuery("tabl")))


def test_single_token_after_analysis_collapses():
    an = Analyzer(stopwords=frozenset({"the"}))
    q = create_boolean_query("the spark", "must", analyzer=an)
    assert q == Q.TermQuery("spark")

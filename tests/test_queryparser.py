"""Classic query-string parser tests (QueryParserBase subset)."""

import pytest

from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.queryparser import QueryParseError, parse


def t(term, boost=1.0):
    return Q.TermQuery(term, boost)


def test_single_term():
    assert parse("Spark") == t("spark")


def test_default_or():
    q = parse("spark table")
    assert q == Q.BooleanQuery(should=(t("spark"), t("table")))


def test_and():
    q = parse("spark AND table")
    assert q == Q.BooleanQuery(must=(t("spark"), t("table")))


def test_and_or_mix_left_fold():
    q = parse("a1 AND b1 OR c1")
    assert q == Q.BooleanQuery(must=(t("a1"), t("b1")), should=(t("c1"),))


def test_not_and_minus():
    assert parse("spark -table") == Q.BooleanQuery(
        should=(t("spark"),), must_not=(t("table"),))
    assert parse("spark NOT table") == Q.BooleanQuery(
        should=(t("spark"),), must_not=(t("table"),))


def test_required_plus():
    assert parse("+spark table") == Q.BooleanQuery(
        must=(t("spark"),), should=(t("table"),))


def test_phrase_and_slop():
    assert parse('"fast sort"') == Q.PhraseQuery(("fast", "sort"))
    assert parse('"fast sort"~2') == Q.PhraseQuery(("fast", "sort"), slop=2)


def test_single_token_phrase_is_term():
    assert parse('"spark"') == t("spark")


def test_field_prefix():
    assert parse("text:spark") == t("spark")
    with pytest.raises(QueryParseError):
        parse("title:spark")


def test_prefix_wildcard_regex():
    assert parse("sp*") == Q.PrefixQuery("sp")
    assert parse("s?an") == Q.WildcardQuery("s?an")
    assert parse("/jo.*/") == Q.RegexpQuery("jo.*")


def test_fuzzy():
    assert parse("spark~") == Q.FuzzyQuery("spark", max_edits=2)
    assert parse("spark~1") == Q.FuzzyQuery("spark", max_edits=1)


def test_range():
    assert parse("[query TO sort]") == Q.TermRangeQuery("query", "sort")
    assert parse("{query TO sort}") == Q.TermRangeQuery(
        "query", "sort", include_lower=False, include_upper=False)
    assert parse("[query TO *]") == Q.TermRangeQuery("query", None)


def test_boost():
    assert parse("spark^2") == t("spark", 2.0)
    q = parse("(spark table)^0.5")
    assert isinstance(q, Q.BoostQuery) and q.boost == 0.5


def test_match_all():
    assert parse("*:*") == Q.MatchAllDocsQuery()


def test_parens_grouping():
    q = parse("merge AND (spark table)")
    assert q == Q.BooleanQuery(must=(
        t("merge"), Q.BooleanQuery(should=(t("spark"), t("table")))))


def test_unbalanced_parens():
    with pytest.raises(QueryParseError):
        parse("(spark")
    with pytest.raises(QueryParseError):
        parse("spark)")


def test_multi_token_bare_text():
    # analyzer splits 'fast-sort' into two tokens -> OR of terms
    q = parse("fast.sort")  # '.' joins alnum in UAX#29 MidNumLet -> one token
    assert q == t("fast.sort")


def test_leading_wildcard_rejected_by_default():
    # QueryParserBase.allowLeadingWildcard defaults to false
    import pytest as _pytest
    with _pytest.raises(QueryParseError):
        parse("*ark")
    with _pytest.raises(QueryParseError):
        parse("?ark")
    # *:* stays legal (MatchAllDocs, not a wildcard term)
    assert parse("*:*") == Q.MatchAllDocsQuery()


def test_leading_wildcard_opt_in():
    q = parse("*ark", allow_leading_wildcard=True)
    assert q == Q.WildcardQuery("*ark")

"""Scale-safe MultiTermQuery rewrite: constant-score expansions must carry a
predicate (pushed into the scan), never a driver-materialized term list; the
scored fuzzy rewrite must cap its expansion at max_expansions
(MultiTermQuery.java:66-100, TopTermsRewrite.java)."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def srch(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mtidx"))
    rows = [(i, f"w{i:03d} common spark") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, df, "doc_id", "text", d, docs_per_segment=40,
                int_keys=True, term_shards=4)
    return IndexSearcher(spark, d)


def test_constant_score_rewrites_to_predicate(srch):
    for q, kind in [(Q.PrefixQuery("w0"), "prefix"),
                    (Q.WildcardQuery("w00?"), "regex"),
                    (Q.RegexpQuery("w0.*"), "regex"),
                    (Q.TermRangeQuery("w000", "w005"), "range")]:
        e = srch._expand_query(q)
        assert isinstance(e, Q.ConstantScoreQuery), q
        assert isinstance(e.query, Q.TermPredicateQuery), q
        assert e.query.kind == kind


def test_predicate_python_vs_column_parity(srch, spark):
    terms = [f"w{i:03d}" for i in range(60)] + ["common", "spark"]
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    for q in [Q.PrefixQuery("w00"), Q.WildcardQuery("w0?5"),
              Q.RegexpQuery("w0[0-2]."), Q.TermRangeQuery("w010", "w020"),
              Q.TermRangeQuery("w010", "w020", include_upper=False),
              Q.TermRangeQuery(None, "w005")]:
        p = srch._expand_query(q).query
        got_sql = {r[0] for r in tdf.where(srch._predicate_col(p)).collect()}
        got_py = {t for t in terms if p.matches(t)}
        # the column filter may over-select (it is a scan pre-filter); the
        # python predicate is the semantics — SQL must be a superset
        assert got_py <= got_sql, q
        # and for these anchored patterns they are identical
        assert got_py == got_sql, q


def test_prefix_search_matches(srch):
    td = srch.search(Q.PrefixQuery("w00"), k=20)
    assert sorted(int(r.key) for r in td.hits.itertuples()) == list(range(10))
    assert all(abs(s - 1.0) < 1e-9 for s in td.hits["score"])


def test_fuzzy_expansion_capped(srch):
    # every w### is within 2 edits of many others; cap must hold
    q = Q.FuzzyQuery("w001", max_edits=2, max_expansions=5)
    e = srch._expand_query(q)
    assert isinstance(e, Q.BlendedTermQuery)
    assert len(e.terms_boosts) == 5
    boosts = dict(e.terms_boosts)
    # FuzzyTermsEnum boosts: exact = 1.0, else 1 - ed/min(len) — here all
    # terms are length 4, so ed=1 -> 0.75, ed=2 -> 0.5
    assert boosts["w001"] == 1.0
    assert all(b in (1.0, 0.75, 0.5) for b in boosts.values())
    # ScoreTermQueue selection (boost desc, term asc): the exact term and
    # every distance-1 neighbor outrank any distance-2 term in the cut
    kept_min = min(boosts.values())
    dropped = [t for t in ("w002", "w010", "w100")
               if t not in boosts]  # distance-1 neighbors of w001
    assert not dropped or kept_min >= 0.75


def test_fuzzy_distance_boost_ranks(srch):
    # equal tf/df everywhere: a distance-1 term's doc must outrank a
    # distance-2 term's doc under the blended scoring
    q = Q.FuzzyQuery("w001", max_edits=2, max_expansions=1000)
    e = srch._expand_query(q)
    assert isinstance(e, Q.BlendedTermQuery)
    boosts = dict(e.terms_boosts)
    assert boosts["w011"] == 0.75 and boosts["w023"] == 0.5  # ed 1 vs 2
    td = srch.search(q, k=100)
    score = {int(r.key): float(r.score) for r in td.hits.itertuples()}
    # doc 11 holds w011 (ed 1), doc 23 holds w023 (ed 2); identical tf/norm
    assert score[11] > score[23]


def test_count_matches_matchset(srch):
    assert srch.count(Q.PrefixQuery("w0")) == 60
    assert srch.count(Q.TermQuery("common")) == 60
    assert srch.count(Q.BooleanQuery(
        must=(Q.TermQuery("common"),),
        must_not=(Q.TermQuery("w001"),))) == 59
    assert srch.count(Q.PhraseQuery(("common", "spark"))) == 60

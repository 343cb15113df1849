"""Round-5b surface: classification module, CommonTermsQuery,
ComplexPhraseQueryParser, FeatureField, polygon query, and the
_predicate_col rlike start-anchor regression.

Reference behavior: classification/KNearestNeighborClassifier.java
(buildListFromTopDocs vote) + SimpleNaiveBayesClassifier.java (add-one
smoothed log-likelihood); queries/CommonTermsQuery.java (df split +
low-MUST/high-SHOULD rewrite); queryparser/complexPhrase/
ComplexPhraseQueryParser.java (wildcards inside phrases); core 8.x
document/FeatureField.java (log/saturation/sigmoid score contributions);
geo/Polygon2D.java (even-odd crossing containment)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.commonterms import common_terms_query
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOCS = [
    (0, "spark merge fast sort spark", "en"),
    (1, "slow merge table scan row", "en"),
    (2, "spark spark table sort small", "fr"),
    (3, "fast fast fast merge dup", "fr"),
    (4, "sort stream spark scan dup", "de"),
    (5, "table row group window join", "de"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r5bidx") / "idx")
    docs = spark.createDataFrame([(i, t) for i, t, _ in DOCS],
                                 "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=3,
                int_keys=True, term_shards=4)
    return d


# --------------------------------------------------------------------------
# CommonTermsQuery rewrite structure
# --------------------------------------------------------------------------

class _FakeSearcher:
    doc_count = 100

    def __init__(self, dfs):
        self._dfs = dfs

    def _global_df(self, terms):
        return {t: self._dfs.get(t, 0) for t in terms}


def test_common_terms_split_structure():
    s = _FakeSearcher({"rare": 2, "common1": 80, "common2": 90})
    q = common_terms_query(s, ("rare", "common1", "common2"),
                           max_term_frequency=0.3)
    assert isinstance(q, Q.BooleanQuery)
    low = q.must[0]
    assert isinstance(low, Q.BoostQuery)
    assert {t.term for t in low.query.should} == {"rare"}
    high = q.should[0]
    assert {t.term for t in high.query.should} == {"common1", "common2"}


def test_common_terms_absolute_cutoff_and_high_only_promotion():
    s = _FakeSearcher({"a": 50, "b": 60})
    # absolute cutoff (>= 1): everything above 10 is high-frequency ->
    # low empty -> promoted to a MUST conjunction (buildQuery:131-139)
    q = common_terms_query(s, ("a", "b"), max_term_frequency=10)
    assert isinstance(q, Q.BoostQuery)
    assert {t.term for t in q.query.must} == {"a", "b"}
    # a high msm keeps SHOULD semantics
    q2 = common_terms_query(s, ("a", "b"), max_term_frequency=10,
                            high_freq_min_should_match=1)
    assert q2.query.should and q2.query.minimum_should_match == 1


def test_common_terms_must_not_rejected():
    with pytest.raises(ValueError):
        common_terms_query(_FakeSearcher({}), ("x",),
                           low_freq_occur="must_not")


def test_common_terms_scores_match_manual_tree(spark, idx):
    s = IndexSearcher(spark, idx, dtype=np.float64)
    # cutoff = ceil(0.3*6) = 2: dup (df 2, not > 2) low; spark/merge (df 3) high
    q = common_terms_query(s, ("dup", "spark", "merge"),
                           max_term_frequency=0.3)
    manual = Q.BooleanQuery(
        must=(Q.BooleanQuery(should=(Q.TermQuery("dup"),)),),
        should=(Q.BooleanQuery(should=(Q.TermQuery("spark"),
                                       Q.TermQuery("merge"))),))
    got = {(r.key, round(float(r.score), 9))
           for r in s.search(q, k=10).hits.itertuples()}
    want = {(r.key, round(float(r.score), 9))
            for r in s.search(manual, k=10).hits.itertuples()}
    assert got == want and got


# --------------------------------------------------------------------------
# ComplexPhraseQueryParser + the rlike anchor regression
# --------------------------------------------------------------------------

def test_complex_phrase_expansion_is_anchored(spark, idx):
    from lucene_7_x_9_x_spark.search.queryparser import complex_phrase_query
    s = IndexSearcher(spark, idx, dtype=np.float64)
    q = complex_phrase_query(s, "fast s*", slop=0)
    assert isinstance(q, Q.MultiPhraseQuery)
    assert q.slots[0] == ("fast",)
    # vocabulary s-terms only: 'fast' must NOT leak in via unanchored rlike
    vocab_s = {t for _, text, _ in DOCS for t in text.split()
               if t.startswith("s")}
    assert set(q.slots[1]) == vocab_s


def test_complex_phrase_matches_explicit_multiphrase(spark, idx):
    from lucene_7_x_9_x_spark.search.queryparser import complex_phrase_query
    s = IndexSearcher(spark, idx, dtype=np.float64)
    q = complex_phrase_query(s, "fast s*", slop=0)
    explicit = Q.MultiPhraseQuery((("fast",), q.slots[1]), slop=0)
    got = [(r.key, float(r.score))
           for r in s.search(q, k=10).hits.itertuples()]
    want = [(r.key, float(r.score))
            for r in s.search(explicit, k=10).hits.itertuples()]
    assert got == want and got  # doc 0 'fast sort', doc 3 'fast fast fast'?


def test_matching_terms_regex_exactness(spark, idx):
    """_predicate_col('regex') must be full-match: pattern s.* returns only
    s-terms (pre-fix it also returned 'fast' — find() matched at offset 2)."""
    s = IndexSearcher(spark, idx)
    import fnmatch
    p = Q.TermPredicateQuery("regex", (fnmatch.translate("s*"),))
    terms = s._matching_terms(p, 64)
    assert terms and all(t.startswith("s") for t in terms)


# --------------------------------------------------------------------------
# FeatureField score functions
# --------------------------------------------------------------------------

def test_feature_field_functions(spark):
    from lucene_7_x_9_x_spark.operators.function_score import (
        feature_field_score)
    scores = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 3.0)],
                                   "doc_id long, score double")
    feats = spark.createDataFrame([(0, 10.0), (1, 40.0)],
                                  "doc_id long, pagerank double")
    for fn, expect in [
        ("saturation", [1.0 + 0.5 * 10 / (10 + 20), 2.0 + 0.5 * 40 / 60,
                        3.0]),
        ("log", [1.0 + 0.5 * math.log(1 + 10), 2.0 + 0.5 * math.log(1 + 40),
                 3.0]),
        ("sigmoid", [1.0 + 0.5 * 100 / (100 + 400), 2.0 + 0.5 * 1600 / 2000,
                     3.0]),
    ]:
        out = feature_field_score(scores, feats, "pagerank", fn=fn,
                                  weight=0.5, pivot=20.0, exp=2.0,
                                  scaling=1.0)
        got = {int(r["doc_id"]): float(r["score"]) for r in out.collect()}
        for i, e in enumerate(expect):
            assert got[i] == pytest.approx(e, rel=1e-12), (fn, i)

    with pytest.raises(ValueError):
        feature_field_score(scores, feats, "pagerank", fn="nope")


# --------------------------------------------------------------------------
# polygon containment vs an independent even-odd implementation
# --------------------------------------------------------------------------

def _pnpoly(lat, lon, verts):
    """W. R. Franklin's pnpoly (independent formulation of the same
    even-odd rule) as the cross-check."""
    inside = False
    n = len(verts)
    j = n - 1
    for i in range(n):
        yi, xi = verts[i]
        yj, xj = verts[j]
        if ((yi > lat) != (yj > lat)) and (
                lon < (xj - xi) * (lat - yi) / (yj - yi) + xi):
            inside = not inside
        j = i
    return inside


def test_polygon_query_matches_pnpoly(spark):
    from lucene_7_x_9_x_spark.operators.geo import polygon_query
    rng = random.Random(11)
    pts = [(i, rng.uniform(-30, 60), rng.uniform(-60, 80))
           for i in range(400)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    poly = [(5.37, -20.73), (42.11, -10.31), (38.43, 30.27),
            (10.93, 44.81), (-8.67, 12.49)]
    got = {int(r["doc_id"])
           for r in polygon_query(df, "lat", "lon", poly).collect()}
    want = {i for i, la, lo in pts if _pnpoly(la, lo, poly)}
    assert got == want and want


def test_polygon_concave(spark):
    from lucene_7_x_9_x_spark.operators.geo import polygon_query
    # concave "crown": between the two prongs (above the notch tip at
    # (5.1, 4.1)) is OUTSIDE even though the bounding box contains it
    poly = [(0.1, 0.1), (10.1, 0.1), (5.1, 4.1), (10.1, 8.1), (0.1, 8.1)]
    pts = [(0, 8.0, 0.5), (1, 8.0, 4.2), (2, 8.0, 7.9), (3, 2.0, 4.0),
           (4, 11.0, 4.0)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    got = {int(r["doc_id"])
           for r in polygon_query(df, "lat", "lon", poly).collect()}
    assert got == {0, 2, 3}  # prongs + body in; notch gap + above-box out
    assert got == {i for i, la, lo in pts if _pnpoly(la, lo, poly)}


# --------------------------------------------------------------------------
# classifiers on a hand-checkable corpus
# --------------------------------------------------------------------------

def test_knn_classifier_vote(spark, idx):
    from lucene_7_x_9_x_spark.classification import knn_classify_df
    s = IndexSearcher(spark, idx, dtype=np.float64)
    labels = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    text = DOCS[0][1]
    out = knn_classify_df(s, text, labels, class_col="lang",
                          key_col="doc_id", k=4, key_type="long").collect()
    # independent recomputation from the searcher's own top-k
    from lucene_7_x_9_x_spark.operators.collectors import more_like_this_terms
    from lucene_7_x_9_x_spark.analysis.tokenizer import STANDARD
    tf = {}
    for t, _ in STANDARD.tokenize(text):
        tf[t] = tf.get(t, 0) + 1
    terms = more_like_this_terms(tf, s._global_df(list(tf)), s.doc_count,
                                 max_terms=5)
    td = s.search(Q.BooleanQuery(
        should=tuple(Q.TermQuery(t) for t in terms)), k=4)
    hits = [(int(r.key), float(r.score)) for r in td.hits.itertuples()]
    maxs = hits[0][1]
    lang_of = {i: l for i, _, l in DOCS}
    boosts, cnt = {}, {}
    for key, sc in hits:
        c = lang_of[key]
        boosts[c] = boosts.get(c, 0.0) + sc / maxs
        cnt[c] = cnt.get(c, 0) + 1
    k_eff = 4 if sum(cnt.values()) >= 4 else sum(cnt.values())
    want = {c: b / k_eff for c, b in boosts.items()}
    got = {r["class"]: float(r["score"]) for r in out}
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], rel=1e-12)
    # ranked output: score desc, class asc
    ranked = [r["class"] for r in out]
    assert ranked == sorted(want, key=lambda c: (-want[c], c))


def test_naive_bayes_hand_computed(spark):
    from lucene_7_x_9_x_spark.classification import nb_classify_df, nb_train
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    model = nb_train(spark, docs, "text", "lang")
    got = {int(r["src_id"]): r["class"]
           for r in nb_classify_df(
               spark, model, [(0, DOCS[0][1]), (5, DOCS[5][1])]).collect()}
    # pure-python recomputation
    by_lang = {}
    for _, text, lang in DOCS:
        by_lang.setdefault(lang, []).append(set(text.split()))
    n = len(DOCS)
    pairs = sum(len(s) for _, t, _ in DOCS for s in [set(t.split())])
    avgu = pairs / n
    def score(tokens, lang):
        docs_c = len(by_lang[lang])
        s = math.log(docs_c) - math.log(n)
        for w in tokens:  # repeats kept
            dfc = sum(1 for d in by_lang[lang] if w in d)
            s += math.log((dfc + 1) / (avgu * docs_c + n))
        return s
    for src in (0, 5):
        toks = DOCS[src][1].split()
        want = min(sorted(by_lang),
                   key=lambda c: (-score(toks, c), c))
        assert got[src] == want, (src, got[src], want)


def test_nb_repeated_tokens_count_repeatedly(spark):
    """calculateLogLikelihood iterates the raw token array — a word
    occurring twice contributes its log-probability twice."""
    from lucene_7_x_9_x_spark.classification import nb_classify_df, nb_train
    docs = spark.createDataFrame(
        [(0, "alpha beta", "x"), (1, "alpha gamma", "y")],
        "doc_id long, text string, lang string")
    model = nb_train(spark, docs, "text", "lang")
    a = nb_classify_df(spark, model, [(0, "beta beta gamma")],
                       return_scores=True).collect()[0]
    b = nb_classify_df(spark, model, [(0, "beta gamma")],
                       return_scores=True).collect()[0]
    assert a["class"] == "x" == b["class"]
    assert a["score"] != pytest.approx(b["score"])


def test_knn_fuzzy_classifier_tolerates_typos(spark, idx):
    """KNearestFuzzyClassifier: a typo'd input still classifies (the fuzzy
    leaves match within edit distance where exact terms would miss)."""
    from lucene_7_x_9_x_spark.classification import knn_classify_df
    s = IndexSearcher(spark, idx, dtype=np.float64)
    labels = spark.createDataFrame(DOCS,
                                   "doc_id long, text string, lang string")
    typo = "spork merje fost sord"  # spark merge fast sort, edit distance 1
    exact = knn_classify_df(s, typo, labels, class_col="lang",
                            key_col="doc_id", k=4, key_type="long").collect()
    assert not exact  # exact terms miss entirely
    fz = knn_classify_df(s, typo, labels, class_col="lang", key_col="doc_id",
                         k=4, key_type="long", fuzzy=True).collect()
    assert fz and fz[0]["score"] > 0

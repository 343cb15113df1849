"""FieldMaskingSpanQuery + SpanMultiTermQueryWrapper (spans leftovers).

FieldMaskingSpanQuery (FieldMaskingSpanQuery.java:30-72): evaluate a span
tree against its real field's positions while reporting — and scoring with —
a masked field, so SpanNear/SpanOr can compose clauses across fields whose
token streams are position-aligned.

SpanMultiTermQueryWrapper (SpanMultiTermQueryWrapper.java:41-44,155-169):
use a MultiTermQuery (prefix/wildcard/regexp/fuzzy/range) inside a span
context by rewriting it to a SpanOr of SpanTermQueries (bounded at
max_expansions by descending docFreq — TopTermsSpanBooleanQueryRewrite).
"""

import pytest

from lucene_7_x_9_x_spark.fields import FIELD_SEP
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.kernel import _span_stats_term
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

# javadoc-style corpus: first/last name streams are position-aligned
MF_ROWS = [
    (0, "sarah james", "jones smith"),   # james@1 (first), jones@0 (last)
    (1, "james sarah", "smith jones"),   # james@0, jones@1
    (2, "peter sarah", "jones king"),    # no james
    (3, "sarah james", "smith jones"),   # james@1, jones@1 (overlap)
]

SF_ROWS = [
    (0, "alphabet soup beta"),
    (1, "alpine road beta"),
    (2, "alpha beta gamma"),
    (3, "beta alpha alpha"),
    (4, "unrelated words"),
]


@pytest.fixture(scope="module")
def mf_searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mask_mf"))
    rows = spark.createDataFrame(
        MF_ROWS, "doc_id long, first string, last string")
    build_index(spark, rows, "doc_id", None, d, docs_per_segment=2,
                int_keys=True, term_shards=4,
                field_cols={"first": "first", "last": "last"},
                default_field="last")
    return IndexSearcher(spark, d)


@pytest.fixture(scope="module")
def sf_searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mask_sf"))
    rows = spark.createDataFrame(SF_ROWS, "doc_id long, text string")
    build_index(spark, rows, "doc_id", "text", d, docs_per_segment=3,
                int_keys=True, term_shards=4)
    return IndexSearcher(spark, d)


def _keys(td):
    return sorted(int(k) for k in td.hits["key"])


# ---- FieldMaskingSpanQuery -------------------------------------------------

def test_mask_composes_across_fields(mf_searcher):
    # last:jones followed immediately by (first:james masked as last):
    # doc 0 only (jones@0, james@1); doc 1 is reversed, doc 3 overlaps
    q = Q.SpanNearQuery(
        (Q.SpanTermQuery("jones", field="last"),
         Q.FieldMaskingSpanQuery(Q.SpanTermQuery("james", field="first"),
                                 "last")),
        slop=0, in_order=True)
    assert _keys(mf_searcher.search(q, k=10)) == [0]


def test_mask_unordered_overlap(mf_searcher):
    # unordered, slop 1: docs 0, 1, and 3 (overlapping positions) qualify
    q = Q.SpanNearQuery(
        (Q.SpanTermQuery("jones", field="last"),
         Q.FieldMaskingSpanQuery(Q.SpanTermQuery("james", field="first"),
                                 "last")),
        slop=1, in_order=False)
    keys = _keys(mf_searcher.search(q, k=10))
    assert 0 in keys and 1 in keys and 2 not in keys


def test_mask_standalone_positions_from_real_field(mf_searcher):
    # a bare mask matches exactly where the inner query matches
    q = Q.FieldMaskingSpanQuery(
        Q.SpanFirstQuery(Q.SpanTermQuery("james", field="first"), end=1),
        "last")
    assert _keys(mf_searcher.search(q, k=10)) == [1]


def test_mask_stats_resolve_to_masked_field(mf_searcher):
    # getField() semantics: the tree's stats/norms field is the MASK
    # (FieldMaskingSpanQuery.java:66-72), term df stays the real field's
    q = mf_searcher._expand_query(Q.SpanNearQuery(
        (Q.FieldMaskingSpanQuery(Q.SpanTermQuery("james", field="first"),
                                 "last"),
         Q.SpanTermQuery("jones", field="last")),
        slop=1, in_order=False))
    assert _span_stats_term(q) == "last" + FIELD_SEP


def test_mask_noop_on_single_field_index(sf_searcher):
    inner = Q.SpanNearQuery(
        (Q.SpanTermQuery("alpha"), Q.SpanTermQuery("beta")),
        slop=0, in_order=True)
    masked = Q.FieldMaskingSpanQuery(inner, "text")
    a = sf_searcher.search(inner, k=10)
    b = sf_searcher.search(masked, k=10)
    assert _keys(a) == _keys(b)
    assert list(a.hits["score"]) == list(b.hits["score"])


def test_mask_uses_masked_field_full_norms(spark, tmp_path_factory):
    """Round-4 advice fix: when the masked field has NO term in the query
    tree, its norms must come from the full .nvd-analog read — never zeros,
    never the real field's lengths. Field b's doclens (5 vs 2) differ from
    field a's, so a wrong-norms implementation scores docs 0/1 equal."""
    import numpy as np

    from lucene_7_x_9_x_spark.functions.similarities import make_similarity
    from lucene_7_x_9_x_spark.functions.smallfloat import int_to_byte4

    d = str(tmp_path_factory.mktemp("mask_norms"))
    rows = spark.createDataFrame(
        [(0, "apple", "one two three four five"),
         (1, "apple banana", "one two"),
         (2, "cherry", "one")],
        "doc_id long, a string, b string")
    build_index(spark, rows, "doc_id", None, d, docs_per_segment=4,
                int_keys=True, term_shards=4,
                field_cols={"a": "a", "b": "b"}, default_field="a")
    s = IndexSearcher(spark, d)
    q = Q.FieldMaskingSpanQuery(Q.SpanTermQuery("apple", field="a"), "b")
    td = s.search(q, k=10)
    got = {int(k): float(sc)
           for k, sc in zip(td.hits["key"], td.hits["score"])}
    assert sorted(got) == [0, 1]
    # expected: BM25 over field b's collection stats (N=3, sumttf=8), the
    # real term's df (2), freq=1 span occurrence, and the MASKED field's
    # doc lengths (5 and 2)
    st = make_similarity("bm25", 3, 8, dtype=np.float32)
    w = st.multi_term_weight([2], 1.0)
    exp = st.score(np.array([1.0, 1.0]), int_to_byte4([5, 2]), w)
    assert got[0] == float(exp[0])
    assert got[1] == float(exp[1])
    assert got[0] != got[1]  # longer masked field scores lower


# ---- SpanMultiTermQueryWrapper ---------------------------------------------

def test_wrapper_prefix_in_span_near(sf_searcher):
    q = Q.SpanNearQuery(
        (Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("alp")),
         Q.SpanTermQuery("beta")),
        slop=0, in_order=True)
    # only doc 2: alpha@0 immediately before beta@1
    assert _keys(sf_searcher.search(q, k=10)) == [2]


def test_wrapper_prefix_with_slop(sf_searcher):
    q = Q.SpanNearQuery(
        (Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("alp")),
         Q.SpanTermQuery("beta")),
        slop=1, in_order=True)
    # docs 0 (alphabet@0..beta@2), 1 (alpine@0..beta@2), 2 (adjacent)
    assert _keys(sf_searcher.search(q, k=10)) == [0, 1, 2]


def test_wrapper_standalone_matches_term_union(sf_searcher):
    q = Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("alp"))
    assert _keys(sf_searcher.search(q, k=10)) == [0, 1, 2, 3]


def test_wrapper_max_expansions_caps_by_df(sf_searcher):
    # alpha df=2 > alphabet/alpine df=1: cap 1 keeps only alpha
    q = Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("alp"), max_expansions=1)
    assert _keys(sf_searcher.search(q, k=10)) == [2, 3]


def test_wrapper_wildcard(sf_searcher):
    q = Q.SpanNearQuery(
        (Q.SpanTermQuery("beta"),
         Q.SpanMultiTermQueryWrapper(Q.WildcardQuery("al*a"))),
        slop=0, in_order=True)
    # 'beta alpha' in doc 3; doc 2 has beta AFTER alpha only
    assert _keys(sf_searcher.search(q, k=10)) == [3]


def test_wrapper_fuzzy(sf_searcher):
    # fuzzy expands through the BlendedTermQuery branch of the rewrite
    q = Q.SpanMultiTermQueryWrapper(Q.FuzzyQuery("alpha", max_edits=1))
    assert _keys(sf_searcher.search(q, k=10)) == [2, 3]


def test_wrapper_no_matches_is_empty(sf_searcher):
    q = Q.SpanNearQuery(
        (Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("zzz")),
         Q.SpanTermQuery("beta")),
        slop=3, in_order=True)
    assert _keys(sf_searcher.search(q, k=10)) == []
    # and standalone: the empty-SpanOr zero-guard in the Scorer
    assert _keys(sf_searcher.search(
        Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("zzz")), k=10)) == []


def test_wrapper_in_multi_field_index(mf_searcher):
    # prefix restricted to the 'first' field, composed with a masked near
    q = Q.SpanNearQuery(
        (Q.SpanTermQuery("jones", field="last"),
         Q.FieldMaskingSpanQuery(
             Q.SpanMultiTermQueryWrapper(Q.PrefixQuery("jam", field="first")),
             "last")),
        slop=0, in_order=True)
    assert _keys(mf_searcher.search(q, k=10)) == [0]

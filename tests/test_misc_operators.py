"""HighFreqTerms + term-vector highlighter (misc / fast-vector-highlighter).

Reference behavior: misc/HighFreqTerms.java (top-N terms by docFreq or
totalTermFreq, term-bytes tiebreak); vectorhighlight/FieldTermStack.java
(match positions sourced from stored term vectors, never re-analysis) with
SimpleFragListBuilder's position-window fragment."""

from collections import Counter

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.operators.misc import high_freq_terms, tv_highlight_topk
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOCS = [
    (0, "spark spark spark merge table"),
    (1, "spark table table row group"),
    (2, "merge merge merge merge plan"),
    (3, "row row spark plan plan plan"),
    (4, "group by plan spark spark"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("miscidx") / "idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=2,
                int_keys=True, term_shards=4, store_term_vectors=True)
    return d


def _expected_counts():
    df, ttf = Counter(), Counter()
    for _, text in DOCS:
        toks = text.split()
        for t in set(toks):
            df[t] += 1
        for t in toks:
            ttf[t] += 1
    return df, ttf


def test_high_freq_terms_by_ttf(spark, idx):
    s = IndexSearcher(spark, idx)
    got = [(r["term"], r["df"], r["ttf"])
           for r in high_freq_terms(s, n=3, order_by="ttf").collect()]
    df, ttf = _expected_counts()
    want = sorted(ttf, key=lambda t: (-ttf[t], t))[:3]
    assert got == [(t, df[t], ttf[t]) for t in want]


def test_high_freq_terms_by_df(spark, idx):
    s = IndexSearcher(spark, idx)
    got = [(r["term"], r["df"]) for r in
           high_freq_terms(s, n=4, order_by="df").collect()]
    df, _ = _expected_counts()
    want = sorted(df, key=lambda t: (-df[t], t))[:4]
    assert [g[0] for g in got] == want
    assert all(g[1] == df[g[0]] for g in got)


def test_high_freq_terms_rejects_bad_order(spark, idx):
    s = IndexSearcher(spark, idx)
    with pytest.raises(ValueError):
        high_freq_terms(s, order_by="freq")


def test_tv_highlight_window_and_tags(spark, idx):
    s = IndexSearcher(spark, idx)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            tv_highlight_topk(s, docs, "spark", k=5, window=1).collect()}
    # doc 0: first pos 0, window [0..1] -> both leading sparks tagged
    assert rows[0]["first_pos"] == 0
    assert rows[0]["snippet"] == "<b>spark</b> <b>spark</b>"
    # doc 3: first pos 2, window [1..3] -> only the match tagged
    assert rows[3]["first_pos"] == 2
    assert rows[3]["snippet"] == "row <b>spark</b> plan"
    # doc 2 has no 'spark' and is not a hit
    assert 2 not in rows


def test_tv_highlight_no_hits(spark, idx):
    s = IndexSearcher(spark, idx)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = tv_highlight_topk(s, docs, "nosuchterm", k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "score_micro", "first_pos", "snippet"]

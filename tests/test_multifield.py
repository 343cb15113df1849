"""Multi-field indexing/search: per-field postings, norms, and BM25 stats.

Differential contract: a field's statistics are independent of every other
field (BM25Similarity.java:74-90 scores with one field's CollectionStatistics;
Document.java:42-44 fields are separate inverted streams). So for any query
scoped to field f, a MULTI-field index must reproduce — bit for bit — the
result of a SINGLE-field index built from column f alone. That single-field
path is itself oracle-pinned by the rest of the suite, which makes it the
reference here.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.queryparser import parse
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

N_DOCS = 300


def _corpus(spark):
    """Deterministic two-field docs: short titles, longer bodies, overlapping
    vocab with different df per field (so title/body stats genuinely differ)."""
    words = ["spark", "table", "merge", "query", "index", "sort", "scan",
             "join", "fast", "slow"]
    rows = []
    for i in range(N_DOCS):
        title = " ".join(words[(i + j) % len(words)]
                         for j in range(2 + i % 3))
        body = " ".join(words[(i * 7 + j * 3) % len(words)]
                        for j in range(8 + i % 13))
        rows.append((i, title, body))
    return spark.createDataFrame(rows, "doc_id long, title string, body string")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = _corpus(spark).cache()
    mf_dir = str(tmp_path_factory.mktemp("mf"))
    ti_dir = str(tmp_path_factory.mktemp("ti"))
    bo_dir = str(tmp_path_factory.mktemp("bo"))
    build_index(spark, corpus, "doc_id", None, mf_dir,
                docs_per_segment=100, segments_per_wave=2, term_shards=8,
                int_keys=True,
                field_cols={"title": "title", "body": "body"},
                default_field="body")
    build_index(spark, corpus, "doc_id", "title", ti_dir,
                docs_per_segment=100, segments_per_wave=2, term_shards=8,
                int_keys=True)
    build_index(spark, corpus, "doc_id", "body", bo_dir,
                docs_per_segment=100, segments_per_wave=2, term_shards=8,
                int_keys=True)
    mf = IndexSearcher(spark, mf_dir)
    ti = IndexSearcher(spark, ti_dir)
    bo = IndexSearcher(spark, bo_dir)
    corpus.unpersist()
    return mf_dir, mf, ti, bo


def _hits(td):
    return [(int(r.segment_id), int(r.docid), float(np.float32(r.score)))
            for r in td.hits.itertuples()]


def test_field_stats_differ(built):
    _, mf, ti, bo = built
    assert mf.multi_field and mf.fields == ["title", "body"]
    t_dc, t_st = mf.field_totals["title"]
    b_dc, b_st = mf.field_totals["body"]
    assert (t_dc, t_st) == (ti.doc_count, ti.sum_ttf)
    assert (b_dc, b_st) == (bo.doc_count, bo.sum_ttf)
    assert t_st != b_st  # genuinely different avgdl


@pytest.mark.parametrize("term", ["spark", "table", "fast"])
def test_field_term_equals_single_field_index(built, term):
    _, mf, ti, bo = built
    for field, ref in (("title", ti), ("body", bo)):
        got = _hits(mf.search(Q.TermQuery(term, field=field), k=10))
        want = _hits(ref.search(Q.TermQuery(term), k=10))
        assert got == want, (field, term)


def test_default_field_is_body(built):
    _, mf, _, bo = built
    got = _hits(mf.search(Q.TermQuery("spark"), k=10))
    want = _hits(bo.search(Q.TermQuery("spark"), k=10))
    assert got == want


def test_cross_field_dismax(built):
    _, mf, ti, bo = built
    q = Q.DisjunctionMaxQuery(
        (Q.TermQuery("spark", field="title"), Q.TermQuery("spark")),
        tie_breaker=0.3)
    got = {}
    sc = mf.search(q, k=300, pruning=False)
    for r in sc.hits.itertuples():
        got[(int(r.segment_id), int(r.docid))] = float(r.score)
    # reference: combine the two single-field indexes' exhaustive scores
    t_sc = {(int(r.segment_id), int(r.docid)): float(r.score)
            for r in ti.scores_df(Q.TermQuery("spark")).toPandas().itertuples()}
    b_sc = {(int(r.segment_id), int(r.docid)): float(r.score)
            for r in bo.scores_df(Q.TermQuery("spark")).toPandas().itertuples()}
    keys = set(t_sc) | set(b_sc)
    assert set(got) == keys
    for k in keys:
        vals = [v for v in (t_sc.get(k), b_sc.get(k)) if v is not None]
        mx, sm = max(vals), sum(vals)
        expect = np.float32(mx + (sm - mx) * 0.3)
        assert np.float32(got[k]) == pytest.approx(float(expect), rel=1e-6)


def test_field_phrase_and_prefix_and_count(built):
    _, mf, ti, _ = built
    ph = Q.PhraseQuery(("spark", "table"), field="title")
    got = _hits(mf.search(ph, k=10))
    want = _hits(ti.search(Q.PhraseQuery(("spark", "table")), k=10))
    assert got == want
    assert got  # non-empty: consecutive words exist in titles
    n_t = mf.count(Q.PrefixQuery("s", field="title"))
    assert n_t == ti.count(Q.PrefixQuery("s"))
    # field term ranges clamp to the field's dictionary
    n_r = mf.count(Q.TermRangeQuery(None, None, field="title"))
    assert n_r == ti.count(Q.TermRangeQuery(None, None))


def test_explain_matches_score(built):
    _, mf, _, _ = built
    q = Q.TermQuery("spark", field="title")
    td = mf.search(q, k=1)
    r = td.hits.iloc[0]
    ex = mf.explain(q, int(r["segment_id"]), int(r["docid"]))
    assert ex["value"] == pytest.approx(float(r["score"]), rel=1e-9)
    assert "title:spark" in ex["description"]


def test_unknown_field_matches_nothing(built):
    _, mf, _, _ = built
    assert mf.count(Q.TermQuery("spark", field="nope")) == 0
    # single-field index: explicit non-default field -> no matches
    _, _, ti, _ = built
    assert ti.count(Q.TermQuery("spark", field="title")) == 0


def test_parser_fielded(built):
    _, mf, ti, _ = built
    q = parse("title:spark AND merge", fields=tuple(mf.fields),
              default_field=mf.default_field)
    assert q == Q.BooleanQuery(must=(Q.TermQuery("spark", field="title"),
                                     Q.TermQuery("merge")))
    q2 = parse('title:"spark table"', fields=tuple(mf.fields),
               default_field=mf.default_field)
    assert q2 == Q.PhraseQuery(("spark", "table"), field="title")
    got = _hits(mf.search(q2, k=10))
    want = _hits(ti.search(Q.PhraseQuery(("spark", "table")), k=10))
    assert got == want


def test_merge_preserves_field_scores(built, spark):
    mf_dir, mf, ti, bo = built
    before_t = _hits(mf.search(Q.TermQuery("table", field="title"), k=10))
    before_b = _hits(mf.search(Q.TermQuery("table"), k=10))
    seg_ids = sorted(s["segment_id"] for s in mf.segments)[:2]
    execute_merge(spark, mf_dir, seg_ids, term_shards=8)
    merged = IndexSearcher(spark, mf_dir)
    assert merged.field_totals == mf.field_totals
    # scores (not docids — they re-base) must be preserved per field
    after_t = [s for _, _, s in
               _hits(merged.search(Q.TermQuery("table", field="title"), k=10))]
    after_b = [s for _, _, s in
               _hits(merged.search(Q.TermQuery("table"), k=10))]
    assert after_t == [s for _, _, s in before_t]
    assert after_b == [s for _, _, s in before_b]

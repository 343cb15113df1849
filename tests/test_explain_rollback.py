"""Explain (score decomposition) + catalog rollback semantics."""

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

ROWS = [
    (0, "spark index engine spark"),
    (1, "spark merge policy"),
    (2, "table scan code"),
    (3, "merge sort table spark"),
]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(ROWS, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=2, int_keys=True,
                term_shards=4)
    return d


def test_explain_matches_search_score(spark, idx):
    s = IndexSearcher(spark, idx)
    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("merge")))
    td = s.search(q, k=4)
    top = td.hits.iloc[0]
    ex = s.explain(q, int(top["segment_id"]), int(top["docid"]))
    assert ex["match"] is True
    assert ex["value"] == pytest.approx(float(top["score"]), abs=0.0)
    # term leaf detail carries the BM25 decomposition
    leaf = ex["details"][0]
    descs = [d["description"] for d in leaf["details"]]
    assert any("idf" in d for d in descs)
    assert any("tf," in d for d in descs)


def test_explain_non_matching_doc(spark, idx):
    s = IndexSearcher(spark, idx)
    ex = s.explain(Q.TermQuery("spark"), 1, 0)  # doc 2 has no 'spark'
    assert ex["match"] is False and ex["value"] == 0.0


def test_rollback_restores_pre_delete_view(spark, idx):
    cat = IndexCatalog(idx)
    snap_before = cat.head()
    w = IndexWriter(spark, idx, int_keys=True)
    w.delete_documents_by_keys([0, 1])
    assert IndexSearcher(spark, idx).count(Q.TermQuery("spark")) == 1
    cat.rollback(snap_before)
    s = IndexSearcher(spark, idx)
    assert s.count(Q.TermQuery("spark")) == 3  # deletes no longer visible
    assert s.count(Q.MatchAllDocsQuery()) == 4


def test_rollback_drops_added_wave(spark, idx):
    cat = IndexCatalog(idx)
    snap_before = cat.head()
    w = IndexWriter(spark, idx, int_keys=True)
    w.add_documents(spark.createDataFrame([(9, "spark addition")],
                                          "doc_id long, text string"),
                    "doc_id", "text")
    assert IndexSearcher(spark, idx).count(Q.TermQuery("spark")) == 4
    cat.rollback(snap_before)
    assert IndexSearcher(spark, idx).count(Q.TermQuery("spark")) == 3

"""IndexWriter.forceMerge analog (TieredMergePolicy.findForcedMerges).

Reference semantics: forceMerge(maxNumSegments) merges until at most that
many segments remain, cascading in waves of maxMergeAtOnceExplicit
(TieredMergePolicy.java findForcedMerges, default 30), and expunges deletes
even from segments that survive the count target (IndexWriter.forceMerge
javadoc: "deleted documents are reclaimed").  Scores must be invariant
(Q14 pattern, test_merge_resume.py)."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.corpus import generate_corpus
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.merge import force_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

N_DOCS = 240


@pytest.fixture(scope="module")
def corpus_df(spark):
    return generate_corpus(spark, N_DOCS, seed=11).cache()


def test_force_merge_to_one_preserves_scores(spark, tmp_path_factory, corpus_df):
    idx = str(tmp_path_factory.mktemp("idx_fm1"))
    build_index(spark, corpus_df, "url", "text", idx,
                docs_per_segment=40, segments_per_wave=3, term_shards=8)
    s1 = IndexSearcher(spark, idx)
    assert len(s1.segments) >= 5
    q = Q.BooleanQuery(should=(Q.TermQuery("the"), Q.TermQuery("search")))
    pre = [(r.key, np.float32(r.score)) for r in s1.search(q, k=10).hits.itertuples()]

    w = IndexWriter(spark, idx, docs_per_segment=40)
    executed = w.force_merge(max_segments=1)
    assert executed
    assert check_index(spark, idx) == []
    s2 = IndexSearcher(spark, idx)
    assert len(s2.segments) == 1
    assert s2.doc_count == s1.doc_count and s2.sum_ttf == s1.sum_ttf
    post = [(r.key, np.float32(r.score)) for r in s2.search(q, k=10).hits.itertuples()]
    assert pre == post


def test_force_merge_cascades_in_explicit_waves(spark, tmp_path_factory, corpus_df):
    idx = str(tmp_path_factory.mktemp("idx_fmw"))
    build_index(spark, corpus_df, "url", "text", idx,
                docs_per_segment=30, segments_per_wave=4, term_shards=8)
    n0 = len(IndexCatalog(idx).live_segments())
    assert n0 >= 8
    executed = force_merge(spark, idx, max_segments=2,
                           max_merge_at_once_explicit=3, term_shards=8)
    # waves bounded by maxMergeAtOnceExplicit, >1 wave needed from >=8 segs
    assert all(2 <= len(m) <= 3 for m in executed)
    assert len(executed) >= 2
    live = IndexCatalog(idx).live_segments()
    assert len(live) <= 2
    assert check_index(spark, idx) == []


def test_force_merge_expunges_deletes_even_at_target(spark, tmp_path):
    idx = str(tmp_path / "idx_fmd")
    docs = spark.createDataFrame(
        [(i, f"spark doc number {i}") for i in range(12)],
        "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", idx,
                docs_per_segment=6, int_keys=True, term_shards=4)
    w = IndexWriter(spark, idx, int_keys=True, docs_per_segment=6)
    w.delete_documents_by_keys([1, 7])
    assert len(IndexCatalog(idx).live_segments()) == 2

    # already at the 2-segment target, but deletes force a rewrite
    executed = w.force_merge(max_segments=2)
    assert executed
    live = IndexCatalog(idx).live_segments()
    assert all(s.get("del_count", 0) == 0 for s in live)
    s = IndexSearcher(spark, idx)
    assert s.doc_count == 10  # stats now reflect expunged deletes
    got = {int(r.key) for r in s.search(Q.TermQuery("spark"), k=20).hits.itertuples()}
    assert got == set(range(12)) - {1, 7}
    assert check_index(spark, idx) == []

    # idempotent: second call is a no-op
    assert w.force_merge(max_segments=2) == []

"""Soft deletes + history retention.

Scenario mirrors LuceneDemo8.4.0 softDeletes/SoftDeletesTest1.java and
HistoryRetention.java: softUpdateDocument hides the old version from the
default reader but keeps it readable through a soft-deletes-inclusive reader,
and a merge RETAINS soft-deleted docs (SoftDeletesRetentionMergePolicy with a
keep-all retention query) while purging hard deletes.
"""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "soft")
    rows = [(i, f"doc{i} common text") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, df, "doc_id", "text", d, docs_per_segment=10,
                int_keys=True, term_shards=4)
    return d


def _keys(searcher, q):
    td = searcher.search(q, k=100)
    if not len(td.hits):
        return []
    return sorted(td.hits["key"].tolist())


def test_soft_update_hides_but_retains(spark, idx):
    w = IndexWriter(spark, idx, docs_per_segment=10, int_keys=True)
    upd = spark.createDataFrame([(3, "doc3v2 fresh text")],
                                "doc_id long, text string")
    w.soft_update_documents(upd, "doc_id", "text")

    default = IndexSearcher(spark, idx)
    history = IndexSearcher(spark, idx, include_soft_deleted=True)

    # default reader: old doc3 hidden, new doc3 visible
    assert _keys(default, Q.TermQuery("doc3")) == []
    assert _keys(default, Q.TermQuery("doc3v2")) == ["3"]
    assert default.count(Q.MatchAllDocsQuery()) == 20  # 21 rows - 1 hidden
    # history reader: BOTH versions visible (the demo's post-softUpdate view)
    assert _keys(history, Q.TermQuery("doc3")) == ["3"]
    assert _keys(history, Q.TermQuery("doc3v2")) == ["3"]
    assert history.count(Q.MatchAllDocsQuery()) == 21


def test_soft_delete_by_keys(spark, idx):
    w = IndexWriter(spark, idx, docs_per_segment=10, int_keys=True)
    n = w.soft_delete_documents_by_keys([5, 6])
    assert n == 2
    assert w.soft_delete_documents_by_keys([5]) == 0  # idempotent
    default = IndexSearcher(spark, idx)
    history = IndexSearcher(spark, idx, include_soft_deleted=True)
    assert _keys(default, Q.TermQuery("doc5")) == []
    assert _keys(history, Q.TermQuery("doc5")) == ["5"]
    assert default.count(Q.MatchAllDocsQuery()) == 18
    assert history.count(Q.MatchAllDocsQuery()) == 20


def test_merge_retains_soft_purges_hard(spark, idx):
    w = IndexWriter(spark, idx, docs_per_segment=10, int_keys=True)
    w.soft_delete_documents_by_keys([2])
    w.delete_documents_by_keys([7])  # hard
    seg_ids = sorted(
        s["segment_id"] for s in IndexSearcher(spark, idx).segments)
    execute_merge(spark, idx, seg_ids, term_shards=4)

    default = IndexSearcher(spark, idx)
    history = IndexSearcher(spark, idx, include_soft_deleted=True)
    # hard-deleted doc7 is GONE for both readers (purged at merge)
    assert _keys(default, Q.TermQuery("doc7")) == []
    assert _keys(history, Q.TermQuery("doc7")) == []
    # soft-deleted doc2 retained: hidden by default, visible to history
    assert _keys(default, Q.TermQuery("doc2")) == []
    assert _keys(history, Q.TermQuery("doc2")) == ["2"]
    assert default.count(Q.MatchAllDocsQuery()) == 18
    assert history.count(Q.MatchAllDocsQuery()) == 19
    merged = max(s["segment_id"] for s in default.segments)
    seg = [s for s in default.segments if s["segment_id"] == merged][0]
    assert seg.get("soft_del_count") == 1 and seg.get("del_count", 0) == 0


def test_rollback_restores_soft_view(spark, idx):
    from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
    cat = IndexCatalog(idx)
    snap_before = cat.head()
    w = IndexWriter(spark, idx, docs_per_segment=10, int_keys=True)
    w.soft_delete_documents_by_keys([1])
    assert IndexSearcher(spark, idx).count(Q.TermQuery("doc1")) == 0
    cat.rollback(snap_before)
    assert IndexSearcher(spark, idx).count(Q.TermQuery("doc1")) == 1


def test_history_retention_merge_policy(spark, tmp_path):
    """HistoryRetention.java end-to-end: five versions of one doc via
    softUpdateDocument, forceMerge(1) under a SoftDeletesRetentionMergePolicy
    whose retention query keeps the last 24 hours — the merged segment holds
    the live version plus exactly the soft-deleted versions inside the
    window (numDocs==1, maxDoc==3, versions {3,4,5}), older history expunged
    like hard deletes."""
    d = str(tmp_path / "retained")
    filler = [(i, f"doc{i} filler text") for i in range(10, 20)]
    base = [(1, "id1 v1 d28")] + filler  # v1 created 28h ago
    df = spark.createDataFrame(base, "doc_id long, text string")
    build_index(spark, df, "doc_id", "text", d, docs_per_segment=6,
                int_keys=True, term_shards=4)
    w = IndexWriter(spark, d, docs_per_segment=6, int_keys=True,
                    term_shards=4)
    for ver, age in (("v2", "d26"), ("v3", "d23"), ("v4", "d12"),
                     ("v5", "d00")):
        upd = spark.createDataFrame([(1, f"id1 {ver} {age}")],
                                    "doc_id long, text string")
        w.soft_update_documents(upd, "doc_id", "text")

    history = IndexSearcher(spark, d, include_soft_deleted=True)
    assert history.count(Q.TermQuery("id1")) == 5  # full history pre-merge

    # retention: creation_date within the last 24 hours (d00..d23 tokens)
    w.force_merge(1, retention_query=Q.TermRangeQuery("d00", "d24"))

    default = IndexSearcher(spark, d)
    history = IndexSearcher(spark, d, include_soft_deleted=True)
    assert len(default.segments) == 1
    # numDocs == 1: only the live newest version for the default reader
    assert _keys(default, Q.TermQuery("id1")) == ["1"]
    assert _keys(default, Q.TermQuery("v5")) == ["1"]
    assert default.count(Q.TermQuery("v4")) == 0
    # maxDoc analog == 3: versions {3,4,5} survive for the history reader
    assert history.count(Q.TermQuery("id1")) == 3
    for kept in ("v3", "v4", "v5"):
        assert _keys(history, Q.TermQuery(kept)) == ["1"]
    # versions 1-2 fell outside retention: gone for BOTH readers
    for dropped in ("v1", "v2"):
        assert history.count(Q.TermQuery(dropped)) == 0
        assert default.count(Q.TermQuery(dropped)) == 0
    # filler docs untouched
    assert default.count(Q.TermQuery("filler")) == 10
    seg = default.segments[0]
    assert seg.get("soft_del_count") == 2 and seg.get("del_count", 0) == 0
    # staging sidecar cleaned up after commit
    import os
    assert not os.path.exists(os.path.join(d, "merge_retention_drops"))

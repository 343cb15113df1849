"""Snapshot retention / deletion policy (IndexDeletionPolicy analog).

Semantics sources (behavior only):
  demo LuceneDemo/src/main/java/lucene/index/IndexDeletePolicyTest.java
    (retain/expire commit points by policy)
  PersistentSnapshotDeletionPolicyTest.java (persisted pins survive restarts)
  IndexFileDeleter.java (files of dropped commit points are deleted)."""

import os

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

BASE = [
    (0, "spark index engine"),
    (1, "spark merge policy"),
    (2, "table scan spark"),
    (3, "merge sort table"),
    (4, "spark spark spark table"),
    (5, "lonely document"),
]


def _seg_dirs(d, root="docs"):
    out = set()
    rdir = os.path.join(d, root)
    if not os.path.isdir(rdir):
        return out
    for w in os.listdir(rdir):
        if w.startswith("wave="):
            for s in os.listdir(os.path.join(rdir, w)):
                if s.startswith("segment_id="):
                    out.add((w, s))
    return out


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "polidx")
    docs = spark.createDataFrame(BASE, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=2, int_keys=True, term_shards=4)
    return d


def test_expire_keeps_head_and_gc_orphans(spark, idx):
    w = IndexWriter(spark, idx, int_keys=True, docs_per_segment=2)
    w.delete_documents_by_keys([3])
    cat = IndexCatalog(idx)
    pre_merge_dirs = _seg_dirs(idx)
    segs = [s["segment_id"] for s in cat.live_segments()]
    execute_merge(spark, idx, segs)  # orphans every pre-merge segment dir
    assert len(cat.snapshots()) >= 3
    report = cat.expire_snapshots(keep_last_n=1)
    assert cat.snapshots() == [cat.head()]
    # pre-merge partitions are gone from disk, merged one remains
    post = _seg_dirs(idx)
    assert post and not (post & pre_merge_dirs)
    assert report["removed_partitions"] >= len(pre_merge_dirs)
    # the delete gen (folded into the merge) is swept too
    assert report["removed_gens"] >= 1
    assert not os.path.isdir(os.path.join(idx, "deletes")) or not any(
        g.startswith("gen=") for g in os.listdir(os.path.join(idx, "deletes")))
    # HEAD still searches correctly
    s = IndexSearcher(spark, idx)
    assert s.count(Q.MatchAllDocsQuery()) == 5
    assert s.count(Q.TermQuery("sort")) == 0


def test_pinned_snapshot_survives_and_rolls_back(spark, idx):
    cat = IndexCatalog(idx)
    pinned_sid = cat.head()
    cat.pin_snapshot(pinned_sid)
    w = IndexWriter(spark, idx, int_keys=True, docs_per_segment=2)
    w.delete_documents_by_keys([0, 1])
    w.add_documents(
        spark.createDataFrame([(100, "fresh spark doc")],
                              "doc_id long, text string"), "doc_id", "text")
    report = cat.expire_snapshots(keep_last_n=1)
    assert pinned_sid in report["kept"]
    assert pinned_sid in cat.snapshots()
    # a fresh catalog sees the pin (persistence)
    assert pinned_sid in IndexCatalog(idx).pinned()
    # rollback to the pinned commit point works and data is intact
    cat.rollback(pinned_sid)
    s = IndexSearcher(spark, idx)
    assert s.count(Q.MatchAllDocsQuery()) == 6
    assert set(s.search(Q.TermQuery("spark"), k=10).hits["key"].astype(int)) \
        == {0, 1, 2, 4}
    # release + expire drops it
    cat.release_snapshot(pinned_sid)
    cat.expire_snapshots(keep_last_n=1)
    assert pinned_sid not in cat.snapshots()


def test_expire_preserves_referenced_gens(spark, idx):
    w = IndexWriter(spark, idx, int_keys=True)
    w.delete_documents_by_keys([5])
    cat = IndexCatalog(idx)
    cat.expire_snapshots(keep_last_n=1)
    # HEAD references the delete gen: it must survive the sweep
    s = IndexSearcher(spark, idx)
    assert s.count(Q.TermQuery("lonely")) == 0
    assert s.count(Q.MatchAllDocsQuery()) == 5

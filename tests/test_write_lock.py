"""write.lock: single-writer exclusion (NativeFSLockFactory analog).

Semantics source (behavior only): o.a.l/store/NativeFSLockFactory.java and
demo LuceneDemo/src/main/java/io/NativeFSLockFactory.java / LockStree.java —
IndexWriter obtains write.lock at construction, a concurrent second writer
gets LockObtainFailedException, and a process crash releases the native lock.
"""

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import (
    LockObtainFailedError, WriteLock)
from lucene_7_x_9_x_spark.index.writer import IndexWriter


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(0, "spark index"), (1, "table merge")], "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=4, int_keys=True, term_shards=2)
    return d


def test_second_writer_refused(spark, idx):
    with IndexWriter(spark, idx, int_keys=True) as _w1:
        with pytest.raises(LockObtainFailedError):
            IndexWriter(spark, idx, int_keys=True)
    # released on close -> a new writer succeeds
    w2 = IndexWriter(spark, idx, int_keys=True)
    w2.close()


def test_lock_released_by_refcount(spark, idx):
    w = IndexWriter(spark, idx, int_keys=True)
    del w  # CPython refcount drop runs WriteLock.__del__
    w2 = IndexWriter(spark, idx, int_keys=True)
    w2.close()


def test_raw_lock_roundtrip(idx):
    with WriteLock(idx) as lk:
        assert lk.held
        with pytest.raises(LockObtainFailedError):
            WriteLock(idx).acquire()
    assert not lk.held
    with WriteLock(idx):
        pass


def test_opt_out(spark, idx):
    """acquire_lock=False writers coexist (the caller owns exclusion —
    e.g. the streaming sink's single long-lived writer)."""
    w1 = IndexWriter(spark, idx, int_keys=True, acquire_lock=False)
    w2 = IndexWriter(spark, idx, int_keys=True, acquire_lock=False)
    w1.close()
    w2.close()

"""CheckIndex -exorcise: detect and drop corrupt segments.

Reference behavior: CheckIndex.java's -exorcise option ("write a new segments
file, removing reference to problematic segments") and the corruption shapes
the demo UnGracefulIndexFilesTest files provoke (segment files missing after
an ungraceful stop)."""

import shutil

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.checkindex import check_index, exorcise
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOCS = [(i, f"spark doc number {i} " + ("table " * (i % 3))) for i in range(24)]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "exidx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=8, int_keys=True, term_shards=4)
    return d


def _seg_dir(d, root, seg):
    cat = IndexCatalog(d)
    s = next(x for x in cat.live_segments() if x["segment_id"] == seg)
    return f"{d}/{root}/wave={s['wave']}/segment_id={seg}"


def test_missing_partitions_detected(spark, idx):
    assert check_index(spark, idx) == []
    shutil.rmtree(_seg_dir(idx, "postings", 1))
    v = check_index(spark, idx)
    assert any("seg=1: postings partition missing" in x for x in v)
    shutil.rmtree(_seg_dir(idx, "docs", 2))
    v = check_index(spark, idx)
    assert any("seg=2: docs partition missing" in x for x in v)


def test_exorcise_drops_corrupt_segments_only(spark, idx):
    shutil.rmtree(_seg_dir(idx, "postings", 1))
    dropped = exorcise(spark, idx)
    assert dropped == [1]
    # the repaired index validates and still answers queries from the
    # surviving segments (docs of segment 1 are LOST, as in Lucene)
    assert check_index(spark, idx) == []
    live = {s["segment_id"] for s in IndexCatalog(idx).live_segments()}
    assert 1 not in live and live
    s = IndexSearcher(spark, idx)
    assert s.count(Q.TermQuery("spark")) == 24 - 8
    # a healthy index is a no-op
    assert exorcise(spark, idx) == []

"""Parallel fields (ParallelLeafReader) — add per-doc fields post-indexing.

Reference behavior (core test TestDemoParallelLeafReader.java): after the
initial indexing, derive a NEW field from stored content, build a per-segment
parallel index for it, search/sort through a ParallelLeafReader that zips the
main and parallel leaves doc-by-doc, and rebuild parallel segments for any
new flush/merge segments on reopen.
"""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

BASE = [
    (0, "spark index engine"),
    (1, "spark merge policy now"),
    (2, "table scan spark"),
    (3, "merge sort table run fast"),
    (4, "spark spark spark table"),
    (5, "lonely document"),
    (6, "index table merge plan"),
    (7, "spark table merge index scan sort"),
]
RATING = [(i, (i * 37) % 11) for i in range(8)]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "pidx")
    docs = spark.createDataFrame(BASE, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=3, int_keys=True, term_shards=4)
    w = IndexWriter(spark, d, int_keys=True)
    ratings = spark.createDataFrame(RATING, "doc_id long, rating long")
    assert w.add_parallel_field("rating", ratings, "doc_id", "rating") == 3
    w.close()
    return d


def _ranked(spark, d, q):
    s = IndexSearcher(spark, d)
    m = s.matches_df(q)
    pf = s.parallel_field_df("rating")
    keyed = s.docs_df().select(
        "segment_id", "docid", F.col("key").cast("long").alias("doc_id"))
    rows = (m.join(pf, ["segment_id", "docid"])
            .join(keyed, ["segment_id", "docid"])
            .orderBy(F.desc("value"), F.asc("doc_id"))
            .select("doc_id", "value").collect())
    return [(int(r["doc_id"]), int(r["value"])) for r in rows]


def _expected(q_docs):
    r = dict(RATING)
    return sorted(((d, r[d]) for d in q_docs), key=lambda x: (-x[1], x[0]))


def test_sort_matches_by_parallel_field(spark, idx):
    got = _ranked(spark, idx, Q.TermQuery("table"))
    assert got == _expected([2, 3, 4, 6, 7])


def test_range_filter_on_parallel_field(spark, idx):
    s = IndexSearcher(spark, idx)
    pf = s.parallel_field_df("rating")
    n = pf.where((F.col("value") >= 5) & (F.col("value") <= 10)).count()
    assert n == sum(1 for _, v in RATING if 5 <= v <= 10)


def test_merge_invalidates_then_refresh_rebuilds(spark, idx):
    segs = [s["segment_id"] for s in IndexCatalog(idx).live_segments()]
    execute_merge(spark, idx, segs)
    s = IndexSearcher(spark, idx)
    # the merged segment has no parallel rows yet: a stale parallel reader
    # must be refused, exactly like the demo pruning old parallel indices
    with pytest.raises(ValueError, match="missing for segments"):
        s.parallel_field_df("rating")
    w = IndexWriter(spark, idx, int_keys=True)
    missing = w.parallel_field_missing("rating")
    assert [m["segment_id"] for m in missing] == [
        s2["segment_id"] for s2 in IndexCatalog(idx).live_segments()]
    ratings = spark.createDataFrame(RATING, "doc_id long, rating long")
    assert w.refresh_parallel_field("rating", ratings, "doc_id", "rating") == 1
    # idempotent second refresh: nothing missing, nothing written
    assert w.refresh_parallel_field("rating", ratings, "doc_id", "rating") == 0
    w.close()
    got = _ranked(spark, idx, Q.TermQuery("table"))
    assert got == _expected([2, 3, 4, 6, 7])

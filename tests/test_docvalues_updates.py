"""In-place numeric DocValues updates (docValuesGen sidecar analog).

Semantics source (behavior only): IndexWriter.updateNumericDocValue +
SegmentCommitInfo docValuesGen; demo
LuceneDemo/src/main/java/lucene/query/UpdateDocValuesTest.java (refresh a
per-doc popularity signal without reindexing, then sort by it)."""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

BASE = [
    (0, "spark index engine", 10),
    (1, "spark merge policy", 20),
    (2, "table scan spark", 30),
    (3, "merge sort table", 40),
    (4, "spark spark spark table", 50),
    (5, "lonely document", 60),
    (6, "index table merge", 70),
    (7, "spark table merge index", 80),
]


@pytest.fixture()
def setup(spark, tmp_path):
    d = str(tmp_path / "dvidx")
    docs = spark.createDataFrame(BASE, "doc_id long, text string, pop long")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=3, int_keys=True, term_shards=4)
    return d, docs


def _values(spark, d, docs):
    s = IndexSearcher(spark, d)
    dv = s.numeric_docvalues("pop", docs, "doc_id", "pop")
    keyed = s.docs_df().select("segment_id", "docid",
                               F.col("key").cast("long").alias("doc_id"))
    rows = (dv.join(keyed, ["segment_id", "docid"])
            .select("doc_id", "value").collect())
    return {int(r["doc_id"]): int(r["value"]) for r in rows}


def test_base_values_without_updates(spark, setup):
    d, docs = setup
    assert _values(spark, d, docs) == {r[0]: r[2] for r in BASE}


def test_bulk_update_overlays_values(spark, setup):
    d, docs = setup
    w = IndexWriter(spark, d, int_keys=True)
    upd = spark.createDataFrame([(1, 999), (4, 111)], "doc_id long, v long")
    n = w.update_numeric_docvalues(upd, "doc_id", "pop", "v")
    assert n == 2
    vals = _values(spark, d, docs)
    assert vals[1] == 999 and vals[4] == 111
    assert vals[0] == 10  # untouched docs keep base values


def test_newest_generation_wins(spark, setup):
    d, docs = setup
    w = IndexWriter(spark, d, int_keys=True)
    w.update_numeric_docvalues(
        spark.createDataFrame([(2, 5)], "doc_id long, v long"),
        "doc_id", "pop", "v")
    w.update_numeric_docvalues(
        spark.createDataFrame([(2, 7)], "doc_id long, v long"),
        "doc_id", "pop", "v")
    assert _values(spark, d, docs)[2] == 7


def test_update_by_query_constant(spark, setup):
    d, docs = setup
    w = IndexWriter(spark, d, int_keys=True)
    n = w.update_numeric_docvalue(Q.TermQuery("lonely"), "pop", 1)
    assert n == 1
    assert _values(spark, d, docs)[5] == 1


def test_rollback_hides_update(spark, setup):
    d, docs = setup
    cat = IndexCatalog(d)
    before = cat.head()
    w = IndexWriter(spark, d, int_keys=True)
    w.update_numeric_docvalues(
        spark.createDataFrame([(3, 123)], "doc_id long, v long"),
        "doc_id", "pop", "v")
    assert _values(spark, d, docs)[3] == 123
    cat.rollback(before)
    assert _values(spark, d, docs)[3] == 40


def test_merge_folds_updates_and_respects_deletes(spark, setup):
    d, docs = setup
    w = IndexWriter(spark, d, int_keys=True)
    w.update_numeric_docvalues(
        spark.createDataFrame([(1, 777), (6, 888)], "doc_id long, v long"),
        "doc_id", "pop", "v")
    w.delete_documents_by_keys([6])  # updated-then-deleted: update must die
    segs = [s["segment_id"] for s in IndexCatalog(d).live_segments()]
    execute_merge(spark, d, segs)
    vals = _values(spark, d, docs)
    assert vals[1] == 777  # survived the merge on the new docids
    assert 6 not in vals
    assert vals[7] == 80
    # post-merge update on the merged segment still works (close the first
    # writer first — two open IndexWriters on one index must be refused by
    # write.lock, and are)
    w.close()
    w2 = IndexWriter(spark, d, int_keys=True)
    w2.update_numeric_docvalues(
        spark.createDataFrame([(1, 11)], "doc_id long, v long"),
        "doc_id", "pop", "v")
    assert _values(spark, d, docs)[1] == 11


def test_uncommitted_gen_invisible(spark, setup):
    """A dv gen dir not listed in the snapshot (crashed writer) is invisible."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    d, docs = setup
    gen_dir = os.path.join(d, "dv_updates", "gen=99", "segment_id=0")
    os.makedirs(gen_dir)
    pq.write_table(pa.table({"docid": pa.array([0], pa.int32()),
                             "field": pa.array(["pop"]),
                             "value": pa.array([42], pa.int64())}),
                   os.path.join(gen_dir, "part.parquet"))
    assert _values(spark, d, docs) == {r[0]: r[2] for r in BASE}


def _bin_values(spark, d, docs):
    s = IndexSearcher(spark, d)
    dv = s.binary_docvalues("tag", docs.select(
        "doc_id", F.concat(F.lit("base-"), F.col("doc_id")).alias("tag")),
        "doc_id", "tag")
    keyed = s.docs_df().select("segment_id", "docid",
                               F.col("key").cast("long").alias("doc_id"))
    rows = (dv.join(keyed, ["segment_id", "docid"])
            .select("doc_id", "value").collect())
    return {int(r["doc_id"]): r["value"] for r in rows}


def test_binary_update_overlays_payloads(spark, setup):
    """updateBinaryDocValue analog (demo BinaryDocValuesTest family): the
    BytesRef payload rides the dv sidecar's value_str channel."""
    d, docs = setup
    w = IndexWriter(spark, d, int_keys=True)
    upd = spark.createDataFrame([(1, "hot"), (4, "cold")],
                                "doc_id long, tag string")
    assert w.update_binary_docvalues(upd, "doc_id", "tag", "tag") == 2
    vals = _bin_values(spark, d, docs)
    assert vals[1] == "hot" and vals[4] == "cold"
    assert vals[0] == "base-0"  # untouched docs keep base payloads
    # numeric overlay on a DIFFERENT field is unaffected by the binary gen
    w.update_numeric_docvalues(
        spark.createDataFrame([(1, 42)], "doc_id long, v long"),
        "doc_id", "pop", "v")
    assert _values(spark, d, docs)[1] == 42
    assert _bin_values(spark, d, docs)[1] == "hot"


def test_binary_update_survives_merge(spark, setup):
    d, docs = setup
    w = IndexWriter(spark, d, int_keys=True)
    w.update_binary_docvalues(
        spark.createDataFrame([(6, "keep")], "doc_id long, tag string"),
        "doc_id", "tag", "tag")
    segs = [s["segment_id"] for s in IndexCatalog(d).live_segments()]
    execute_merge(spark, d, segs)
    vals = _bin_values(spark, d, docs)
    assert vals[6] == "keep"
    assert vals[3] == "base-3"

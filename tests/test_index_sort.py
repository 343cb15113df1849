"""Index sorting (IndexWriterConfig.setIndexSort) + early termination.

Reference behavior: demos IndexSortTest.java / SegmentInnerSort.java (docids
within a segment follow the sort field), ValidateIndexSort.java (CheckIndex
verifies the invariant), TestEarlyTerminal.java and
NumericDocValuesTopNOptimization.java (sorted top-N stops after k hits per
leaf), MultiSorter.java (merges of sorted segments merge-sort by the field).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

N = 240
SEG = 64


def _corpus(spark):
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "spark", "sort", "merge"]
    rows = []
    for i in range(N):
        text = " ".join(rng.choice(words, size=rng.randint(3, 12)))
        rows.append((i, text, int(rng.randint(0, 50))))
    return spark.createDataFrame(rows, "doc_id long, text string, ts long")


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("srtidx")) + "/idx"
    build_index(spark, _corpus(spark), key_col="doc_id", text_col="text",
                index_dir=idx, docs_per_segment=SEG, int_keys=True,
                index_sort=("ts", True))
    return idx


def _expected_topk(spark, k, pred=None):
    pdf = _corpus(spark).toPandas()
    if pred is not None:
        pdf = pdf[pred(pdf)]
    pdf = pdf.sort_values(["ts", "doc_id"]).head(k)
    return list(zip(pdf["doc_id"].tolist(), pdf["ts"].tolist()))


def test_docids_follow_sort_within_segment(spark, sorted_idx):
    s = IndexSearcher(spark, sorted_idx)
    docs = s.docs_df().select("segment_id", "docid", "sort_value").toPandas()
    for _, g in docs.groupby("segment_id"):
        v = g.sort_values("docid")["sort_value"].values
        assert (np.diff(v) >= 0).all(), "segment not in sort order"


def test_checkindex_validates_sort(spark, sorted_idx):
    assert check_index(spark, sorted_idx) == []


def test_match_all_sorted_topk(spark, sorted_idx):
    s = IndexSearcher(spark, sorted_idx)
    got = [(int(r["key"]), int(r["sort_value"]))
           for r in s.sorted_index_topk(10).collect()]
    assert got == _expected_topk(spark, 10)


def test_match_all_prefix_is_pushed_scan(spark, sorted_idx):
    """The match-all path's docid bound must reach the parquet scan."""
    s = IndexSearcher(spark, sorted_idx)
    plan = s.sorted_index_topk(10)._jdf.queryExecution().executedPlan().toString()
    assert "LessThan(docid,10" in plan.replace(" ", ""), plan


def test_filtered_sorted_topk(spark, sorted_idx):
    s = IndexSearcher(spark, sorted_idx)
    q = Q.TermQuery("spark")
    got = [(int(r["key"]), int(r["sort_value"]))
           for r in s.sorted_index_topk(10, query=q).collect()]
    exp = _expected_topk(
        spark, 10, pred=lambda p: p["text"].str.split(" ").map(
            lambda ws: "spark" in ws))
    assert got == exp


def test_descending_sort(spark, tmp_path):
    idx = str(tmp_path / "idx_desc")
    build_index(spark, _corpus(spark), key_col="doc_id", text_col="text",
                index_dir=idx, docs_per_segment=SEG, int_keys=True,
                index_sort=("ts", False))
    assert check_index(spark, idx) == []
    s = IndexSearcher(spark, idx)
    got = [(int(r["key"]), int(r["sort_value"]))
           for r in s.sorted_index_topk(5).collect()]
    pdf = _corpus(spark).toPandas().sort_values(
        ["ts", "doc_id"], ascending=[False, True]).head(5)
    assert got == list(zip(pdf["doc_id"].tolist(), pdf["ts"].tolist()))


def test_sorted_topk_after_deletes(spark, tmp_path):
    idx = str(tmp_path / "idx_del")
    build_index(spark, _corpus(spark), key_col="doc_id", text_col="text",
                index_dir=idx, docs_per_segment=SEG, int_keys=True,
                index_sort=("ts", True))
    # delete the current global top-3 so the prefix widening matters
    top3 = [d for d, _ in _expected_topk(spark, 3)]
    w = IndexWriter(spark, idx, int_keys=True)
    assert w.delete_documents_by_keys(top3) == 3
    s = IndexSearcher(spark, idx)
    got = [(int(r["key"]), int(r["sort_value"]))
           for r in s.sorted_index_topk(10).collect()]
    exp = _expected_topk(spark, 10, pred=lambda p: ~p["doc_id"].isin(top3))
    assert got == exp


def test_merge_preserves_sort_and_scores(spark, tmp_path):
    idx = str(tmp_path / "idx_merge")
    build_index(spark, _corpus(spark), key_col="doc_id", text_col="text",
                index_dir=idx, docs_per_segment=SEG, int_keys=True,
                index_sort=("ts", True))
    # delete a few docs so the sorted merge also exercises delete purge
    w = IndexWriter(spark, idx, int_keys=True)
    w.delete_documents_by_keys([5, 70, 140])
    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("sort")))
    # reference: a fresh sorted index over the corpus MINUS the deleted docs
    # — the merge purges deletes, so post-merge stats (doc_count, df) shrink
    # exactly to this (Lucene merges reclaim deleted docs from stats the same
    # way). Ties may break in a different docid order after the sorted
    # renumbering, so compare the complete per-key score map.
    ref = str(tmp_path / "idx_ref")
    build_index(spark, _corpus(spark).where(~F.col("doc_id").isin(5, 70, 140)),
                key_col="doc_id", text_col="text", index_dir=ref,
                docs_per_segment=SEG, int_keys=True, index_sort=("ts", True))
    before = IndexSearcher(spark, ref).search(q, k=N).hits
    seg_ids = [s["segment_id"] for s in IndexCatalog(idx).live_segments()]
    assert len(seg_ids) >= 2
    execute_merge(spark, idx, seg_ids)
    assert check_index(spark, idx) == [], "merged sorted index must validate"
    cat = IndexCatalog(idx)
    assert len(cat.live_segments()) == 1
    s_after = IndexSearcher(spark, idx)
    after = s_after.search(q, k=N).hits
    b = dict(zip(before["key"], before["score"]))
    a = dict(zip(after["key"], after["score"]))
    assert set(b) == set(a)
    assert all(np.isclose(b[k], a[k]) for k in b)
    # merged segment still early-terminates correctly
    got = [(int(r["key"]), int(r["sort_value"]))
           for r in s_after.sorted_index_topk(10).collect()]
    exp = _expected_topk(
        spark, 10, pred=lambda p: ~p["doc_id"].isin([5, 70, 140]))
    assert got == exp


def test_index_sort_recorded_and_immutable(spark, sorted_idx):
    s = IndexSearcher(spark, sorted_idx)
    assert s.index_sort == ("ts", True)
    # resume with a DIFFERENT sort silently keeps the recorded one (Lucene
    # refuses to change an index sort; recording wins)
    build_index(spark, _corpus(spark), key_col="doc_id", text_col="text",
                index_dir=sorted_idx, docs_per_segment=SEG, int_keys=True,
                index_sort=("ts", False), resume=True)
    assert IndexSearcher(spark, sorted_idx).index_sort == ("ts", True)

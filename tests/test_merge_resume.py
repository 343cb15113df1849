"""Tiered merge + checkpoint/resume semantics.

Merge: policy port checked against TieredMergePolicy behavior shapes
(TestTieredMergePolicy patterns); execution checked via Q14 (FIXTURES.md §3):
scores invariant under merge, docids re-based (DocIDMerger.java:34).
Resume: kill-resume produces an index equivalent to a one-shot build
(north_rule resumability clause).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.corpus import generate_corpus
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.merge import (
    TieredMergeConfig, find_merges, execute_merge, maybe_merge)
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher
from lucene_7_x_9_x_spark.search.oracle import OracleIndex

N_DOCS = 300


def _seg(sid, size_mb, max_doc=1000, dels=0):
    return {"segment_id": sid, "wave": 0, "doc_count": max_doc - dels,
            "sum_ttf": 0, "max_doc": max_doc, "size_bytes": int(size_mb * 2**20),
            "del_count": dels, "merged_from": []}


def test_policy_no_merge_when_under_budget():
    segs = [_seg(i, 100) for i in range(5)]
    assert find_merges(segs) == []


def test_policy_merges_equal_small_segments():
    cfg = TieredMergeConfig(floor_segment_bytes=1024, segs_per_tier=4.0,
                            max_merge_at_once=4)
    segs = [_seg(i, 1) for i in range(16)]
    merges = find_merges(segs, cfg)
    assert merges, "16 equal segments over a 4-per-tier budget must merge"
    assert all(len(m) == 4 for m in merges)


def test_policy_prefers_balanced_merges():
    cfg = TieredMergeConfig(floor_segment_bytes=1024, segs_per_tier=2.0,
                            max_merge_at_once=2)
    segs = [_seg(0, 512)] + [_seg(i, 1) for i in range(1, 33)]
    merges = find_merges(segs, cfg)
    assert merges
    # balanced small pairs score better (lower skew) than pairing with 512MB
    assert all(0 not in m for m in merges)


def test_policy_respects_max_merged_segment():
    cfg = TieredMergeConfig(floor_segment_bytes=1024, segs_per_tier=2.0,
                            max_merge_at_once=10,
                            max_merged_segment_bytes=3 * 2**20)
    segs = [_seg(i, 2) for i in range(8)]
    merges = find_merges(segs, cfg)
    for m in merges:
        tot = sum(2 * 2**20 for _ in m)
        assert tot <= 4 * 2**20  # packing may hit the limit but not wildly


@pytest.fixture(scope="module")
def corpus_df(spark):
    return generate_corpus(spark, N_DOCS, seed=7).cache()


def _oracle_for(searcher, corpus_df):
    docs_pd = (
        searcher.docs_df().select("segment_id", "docid", "key").toPandas()
        .merge(corpus_df.selectExpr("url as key", "text").toPandas(), on="key")
    )
    return OracleIndex(docs_pd)


def test_merge_preserves_scores(spark, tmp_path_factory, corpus_df):
    idx = str(tmp_path_factory.mktemp("idx_m"))
    build_index(spark, corpus_df, "url", "text", idx,
                docs_per_segment=80, segments_per_wave=4, term_shards=8)
    s1 = IndexSearcher(spark, idx)
    assert len(s1.segments) >= 3
    q = Q.BooleanQuery(should=(Q.TermQuery("the"), Q.TermQuery("merge")))
    pre = s1.search(q, k=10)
    pre_pairs = [(r.key, np.float32(r.score)) for r in pre.hits.itertuples()]

    new_id = execute_merge(spark, idx, [s["segment_id"] for s in s1.segments])
    assert check_index(spark, idx) == []
    s2 = IndexSearcher(spark, idx)
    assert [s["segment_id"] for s in s2.segments] == [new_id]
    assert s2.doc_count == s1.doc_count and s2.sum_ttf == s1.sum_ttf

    post = s2.search(q, k=10)
    post_pairs = [(r.key, np.float32(r.score)) for r in post.hits.itertuples()]
    # Q14: same docs (by key), same float32 scores; merged concatenation keeps
    # segment order, so the full ranking is preserved
    assert pre_pairs == post_pairs

    # rank-identical vs an oracle rebuilt on the post-merge docid mapping
    oracle = _oracle_for(s2, corpus_df)
    want, _ = oracle.top_k(q, k=10)
    got = [(int(r.segment_id), int(r.docid), float(r.score))
           for r in post.hits.itertuples()]
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    assert all(np.float32(g[2]) == np.float32(w[2]) for g, w in zip(got, want))


def test_maybe_merge_loop(spark, tmp_path_factory, corpus_df):
    idx = str(tmp_path_factory.mktemp("idx_mm"))
    build_index(spark, corpus_df, "url", "text", idx,
                docs_per_segment=40, segments_per_wave=8, term_shards=8)
    n_before = len(IndexCatalog(idx).live_segments())
    assert n_before >= 7
    cfg = TieredMergeConfig(floor_segment_bytes=1024, segs_per_tier=2.0,
                            max_merge_at_once=4)
    executed = maybe_merge(spark, idx, cfg)
    assert executed
    after = IndexCatalog(idx).live_segments()
    assert len(after) < n_before
    assert check_index(spark, idx) == []
    # lineage recorded one row per merge
    lin = spark.read.parquet(IndexCatalog(idx).lineage_path())
    assert lin.where("stage = 'merge'").count() == len(executed)


def _decoded_index_state(spark, idx):
    from lucene_7_x_9_x_spark.functions.codecs import decode_blocks
    cat = IndexCatalog(idx)
    live = [(s["wave"], s["segment_id"]) for s in cat.live_segments()]
    from pyspark.sql import functions as F
    docs = (spark.read.parquet(f"{idx}/docs")
            .where(F.struct("wave", "segment_id").isin(
                [F.struct(F.lit(w), F.lit(s)) for w, s in live]))
            .select("segment_id", "docid", "key", "doclen", "norm_byte")
            .toPandas().sort_values(["segment_id", "docid"]).reset_index(drop=True))
    post = (spark.read.parquet(f"{idx}/postings")
            .where(F.struct("wave", "segment_id").isin(
                [F.struct(F.lit(w), F.lit(s)) for w, s in live]))
            .toPandas())
    decoded = {}
    for r in post.itertuples():
        blocks = [b if isinstance(b, dict) else b.asDict() for b in r.blocks]
        d, f, nb = decode_blocks(blocks)
        decoded[(int(r.segment_id), r.term)] = (
            int(r.df), int(r.ttf), d.tolist(), f.tolist(), nb.tolist())
    return docs, decoded


@pytest.mark.parametrize("crash", [("after_docs", 1), ("after_commit", 0)])
def test_kill_resume_equivalence(spark, tmp_path_factory, corpus_df, crash):
    mode, wave = crash
    idx_full = str(tmp_path_factory.mktemp("idx_full"))
    build_index(spark, corpus_df, "url", "text", idx_full,
                docs_per_segment=80, segments_per_wave=2, term_shards=8)

    idx_crash = str(tmp_path_factory.mktemp("idx_crash"))
    with pytest.raises(RuntimeError, match="injected crash"):
        build_index(spark, corpus_df, "url", "text", idx_crash,
                    docs_per_segment=80, segments_per_wave=2, term_shards=8,
                    _crash_point=(wave, mode))
    # resume completes the build
    build_index(spark, corpus_df, "url", "text", idx_crash,
                docs_per_segment=80, segments_per_wave=2, term_shards=8,
                resume=True)
    assert check_index(spark, idx_crash) == []

    docs_a, post_a = _decoded_index_state(spark, idx_full)
    docs_b, post_b = _decoded_index_state(spark, idx_crash)
    pd.testing.assert_frame_equal(docs_a, docs_b)
    assert post_a == post_b

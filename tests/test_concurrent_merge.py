"""ConcurrentMergeScheduler analog: a round's disjoint merges run in
parallel threads with pre-reserved segment ids and a serialized commit
section (ConcurrentMergeScheduler.java maxThreadCount; IndexWriter.java
commitMerge's synchronized block). Results must be identical to sequential
execution — only wall-clock changes."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.merge import TieredMergeConfig, maybe_merge
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

N = 256
CFG = TieredMergeConfig(floor_segment_bytes=1024, segs_per_tier=2.0,
                        max_merge_at_once=2)


def _corpus(spark):
    rng = np.random.RandomState(11)
    words = ["spark", "table", "merge", "sort", "scan", "plan", "index"]
    rows = [(i, " ".join(rng.choice(words, size=rng.randint(3, 9))))
            for i in range(N)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, path):
    build_index(spark, _corpus(spark), "doc_id", "text", path,
                docs_per_segment=16, int_keys=True, term_shards=4)
    return path


def test_concurrent_round_equals_sequential(spark, tmp_path):
    seq = _build(spark, str(tmp_path / "seq"))
    con = _build(spark, str(tmp_path / "con"))
    done_seq = maybe_merge(spark, seq, CFG, max_rounds=1)
    done_con = maybe_merge(spark, con, CFG, max_rounds=1,
                           max_concurrent_merges=4)
    assert len(done_seq) == len(done_con) >= 2, \
        "fixture must produce a multi-merge round"
    assert check_index(spark, con) == []
    # same live segment count, all merges visible in one catalog lineage
    assert (len(IndexCatalog(con).live_segments())
            == len(IndexCatalog(seq).live_segments()))
    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("sort")))
    h_seq = IndexSearcher(spark, seq).search(q, k=N).hits
    h_con = IndexSearcher(spark, con).search(q, k=N).hits
    assert dict(zip(h_seq["key"], h_seq["score"])) == pytest.approx(
        dict(zip(h_con["key"], h_con["score"])))


def test_concurrent_rounds_converge(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "conv"))
    maybe_merge(spark, idx, CFG, max_rounds=10, max_concurrent_merges=4)
    assert check_index(spark, idx) == []
    # the policy is satisfied: no further merges wanted
    from lucene_7_x_9_x_spark.index.merge import find_merges
    assert find_merges(IndexCatalog(idx).live_segments(), CFG) == []
    s = IndexSearcher(spark, idx)
    assert s.count(Q.MatchAllDocsQuery()) == N

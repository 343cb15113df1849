"""JoinUtil ScoreMode propagation + sparse-vector KNN (round 4).

References (behavior only): join/src/java/.../join/JoinUtil.java and
GlobalOrdinalsWithScoreCollector (Max/Total/Avg/Min/None);
LuceneDemo9.8.0/src/main/java/TestSparseKNN1.java (sparse dot-product KNN).
"""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.operators.join import join_with_score_mode
from lucene_7_x_9_x_spark.pipeline.similarity import sparse_knn_query
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def join_frames(spark):
    from_scores = spark.createDataFrame(
        [(0, 2.0), (1, 4.0), (2, 6.0), (3, 10.0)], "doc_id long, score double")
    values = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "a"), (5, "c")],
        "doc_id long, value string")
    return from_scores, values


def _collect(df):
    return {int(r["doc_id"]): float(r["score"]) for r in df.collect()}


def test_scoremode_max(spark, join_frames):
    fs, vals = join_frames
    got = _collect(join_with_score_mode(fs, vals, vals, "max"))
    # a: max(2,4)=4 -> docs 0,1,4; b: max(6,10)=10 -> docs 2,3; c unmatched
    assert got == {0: 4.0, 1: 4.0, 4: 4.0, 2: 10.0, 3: 10.0}


def test_scoremode_total_avg_min(spark, join_frames):
    fs, vals = join_frames
    assert _collect(join_with_score_mode(fs, vals, vals, "total"))[4] == 6.0
    assert _collect(join_with_score_mode(fs, vals, vals, "avg"))[2] == 8.0
    assert _collect(join_with_score_mode(fs, vals, vals, "min"))[0] == 2.0


def test_scoremode_none_constant(spark, join_frames):
    fs, vals = join_frames
    got = _collect(join_with_score_mode(fs, vals, vals, "none"))
    assert set(got.values()) == {1.0}
    assert set(got) == {0, 1, 2, 3, 4}  # 'c' docs excluded (no from match)


def test_scoremode_unknown_raises(spark, join_frames):
    fs, vals = join_frames
    with pytest.raises(ValueError):
        join_with_score_mode(fs, vals, vals, "sum")


# ---- sparse KNN over the inverted index -------------------------------------

ROWS = [
    (0, "spark spark table sort"),
    (1, "table table table"),
    (2, "sort sort sort sort"),
    (3, "unrelated filler words"),
]


@pytest.fixture(scope="module")
def sparse_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sparse"))
    build_index(spark, spark.createDataFrame(ROWS, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=2, int_keys=True,
                term_shards=4)
    return d


def test_sparse_knn_dot_product(spark, sparse_idx):
    s = IndexSearcher(spark, sparse_idx, similarity="dot")
    qv = {"spark": 2.0, "table": 0.5, "sort": 1.0}
    td = s.search(sparse_knn_query(qv), k=10)
    got = {int(k): float(v) for k, v in zip(td.hits["key"], td.hits["score"])}
    # exact dot products: d0 = 2*2 + 0.5*1 + 1*1 = 5.5; d1 = 1.5; d2 = 4.0
    assert got == {0: 5.5, 1: 1.5, 2: 4.0}
    assert [int(k) for k in td.hits["key"]] == [0, 2, 1]


def test_sparse_knn_pruned_equals_exhaustive(spark, sparse_idx):
    s = IndexSearcher(spark, sparse_idx, similarity="dot")
    q = sparse_knn_query({"spark": 1.25, "sort": 0.75})
    a = s.search(q, k=3, pruning=True).hits
    b = s.search(q, k=3, pruning=False).hits
    assert list(a["key"]) == list(b["key"])
    np.testing.assert_array_equal(a["score"].values, b["score"].values)

"""VectorSimilarityFunction metrics for dense KNN (Lucene 9 KnnVectorField):
EUCLIDEAN 1/(1+d2), DOT_PRODUCT (1+dot)/2, COSINE (1+cos)/2 — score
conventions of o.a.l.index.VectorSimilarityFunction."""

import math

import pytest

from lucene_7_x_9_x_spark.pipeline import similarity


VECS = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 0.0]),
        (3, [-1.0, 0.0]), (4, [0.6, 0.8])]


@pytest.fixture(scope="module")
def frames(spark):
    emb = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])],
                              "query_id long, query_vec array<double>")
    return emb, q


def _scores(out):
    return {int(r.vec_id): r.score for r in out.collect()}


def test_euclidean_scores(frames):
    emb, q = frames
    got = _scores(similarity.knn_top_k(emb, q, k=5, metric="euclidean"))
    for vid, v in VECS:
        d2 = sum((a - b) ** 2 for a, b in zip(v, [1.0, 0.0]))
        assert got[vid] == pytest.approx(1.0 / (1.0 + d2))
    # the query vector itself ranks first
    top = similarity.knn_top_k(emb, q, k=1, metric="euclidean").collect()[0]
    assert top.vec_id == 0 and top.score == pytest.approx(1.0)


def test_dot_and_cosine_scores(frames):
    emb, q = frames
    dot = _scores(similarity.knn_top_k(emb, q, k=5, metric="dot"))
    cos = _scores(similarity.knn_top_k(emb, q, k=5, metric="cosine"))
    for vid, v in VECS:
        d = v[0] * 1.0 + v[1] * 0.0
        n = math.sqrt(v[0] ** 2 + v[1] ** 2)
        assert dot[vid] == pytest.approx((1.0 + d) / 2.0)
        assert cos[vid] == pytest.approx((1.0 + d / n) / 2.0)
    # dot rewards magnitude (vec 2 beats vec 0); cosine does not
    assert dot[2] > dot[0]
    assert cos[2] == pytest.approx(cos[0])


def test_unknown_metric_raises(frames):
    emb, q = frames
    with pytest.raises(ValueError):
        similarity.knn_top_k(emb, q, metric="manhattan")

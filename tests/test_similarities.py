"""Pluggable Similarity: Classic TF-IDF and Boolean vs default BM25."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions.similarities import (BooleanSimilarity,
                                                         ClassicSimilarity,
                                                         make_similarity)
from lucene_7_x_9_x_spark.functions.smallfloat import int_to_byte4
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

ROWS = [
    (0, "spark spark spark spark filler"),
    (1, "spark alone here today friend"),
    (2, "totally unrelated content row"),
    (3, "spark " + "pad " * 60),
]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(ROWS, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=2, int_keys=True,
                term_shards=4)
    return d


def test_classic_formula_unit():
    sim = ClassicSimilarity(doc_count=100, sum_ttf=1000, dtype=np.float64)
    w = sim.weight(df=9, boost=1.0)
    assert w == pytest.approx(np.log(101 / 10.0) + 1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    s = sim.score(np.array([4]), np.array([nb]), w)
    assert s[0] == pytest.approx(float(w) * 2.0 * (1.0 / 4.0))  # sqrt(4)/sqrt(16)


def test_boolean_similarity_constant(spark, idx):
    s = IndexSearcher(spark, idx, similarity="boolean")
    td = s.search(Q.TermQuery("spark"), k=10)
    assert set(np.round(td.hits["score"], 6)) == {1.0}
    assert len(td.hits) == 3
    # tie-break by (segment order, docid) -> key order here
    assert [int(k) for k in td.hits["key"]] == [0, 1, 3]


def test_classic_ranks_by_tf_over_length(spark, idx):
    s = IndexSearcher(spark, idx, similarity="classic")
    td = s.search(Q.TermQuery("spark"), k=10)
    keys = [int(k) for k in td.hits["key"]]
    # doc 0: tf=4, dl=5 -> sqrt(4)/sqrt(5); doc 1: 1/sqrt(5); doc 3: 1/sqrt(61q)
    assert keys[0] == 0 and keys[-1] == 3


def test_classic_pruned_equals_exhaustive(spark, idx):
    s = IndexSearcher(spark, idx, similarity="classic")
    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("filler")))
    a = s.search(q, k=4, pruning=True).hits
    b = s.search(q, k=4, pruning=False).hits
    assert list(a["key"]) == list(b["key"])
    np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_registry_unknown():
    with pytest.raises(ValueError):
        make_similarity("nope", 1, 1)
    assert isinstance(make_similarity("boolean", 1, 1), BooleanSimilarity)

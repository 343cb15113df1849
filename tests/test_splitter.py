"""PKIndexSplitter (misc/.../index/PKIndexSplitter.java): split by query
into complementary-liveDocs copies; docids/scores untouched; force_merge
physically drops a side's dead docs."""

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.splitter import split_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOCS = [(i, ("spark table " if i % 3 == 0 else "merge plan ") + f"row{i}")
        for i in range(30)]


@pytest.fixture()
def src(spark, tmp_path):
    d = str(tmp_path / "src")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=8,
                int_keys=True, term_shards=4)
    return d


def test_split_by_query(spark, src, tmp_path):
    p, f = str(tmp_path / "pass"), str(tmp_path / "fail")
    n_pass, n_fail = split_index(spark, src, p, f, Q.TermQuery("spark"))
    n_match = sum(1 for i, _ in DOCS if i % 3 == 0)
    assert (n_pass, n_fail) == (n_match, len(DOCS) - n_match)
    sp, sf = IndexSearcher(spark, p), IndexSearcher(spark, f)
    # each side answers only its own docs
    assert sp.count(Q.TermQuery("spark")) == n_match
    assert sp.count(Q.TermQuery("merge")) == 0
    assert sf.count(Q.TermQuery("merge")) == len(DOCS) - n_match
    assert sf.count(Q.TermQuery("spark")) == 0
    assert check_index(spark, p) == [] and check_index(spark, f) == []


def test_split_preserves_scores(spark, src, tmp_path):
    """Docids and norms are untouched, so surviving docs keep their exact
    scores (the source's stats: the split marks deletes, never rebuilds)."""
    p, f = str(tmp_path / "p2"), str(tmp_path / "f2")
    split_index(spark, src, p, f, Q.TermQuery("spark"))
    s_src = IndexSearcher(spark, src)
    s_pass = IndexSearcher(spark, p)
    src_hits = s_src.search(Q.TermQuery("spark"), k=5).hits
    pass_hits = s_pass.search(Q.TermQuery("spark"), k=5).hits
    assert list(src_hits["key"]) == list(pass_hits["key"])
    assert list(src_hits["score"]) == list(pass_hits["score"])


def test_split_refuses_existing_dest(spark, src, tmp_path):
    p, f = str(tmp_path / "p3"), str(tmp_path / "f3")
    split_index(spark, src, p, f, Q.TermQuery("spark"))
    with pytest.raises(ValueError):
        split_index(spark, src, p, str(tmp_path / "other"),
                    Q.TermQuery("spark"))


def test_multi_pass_round_robin(spark, src, tmp_path):
    from lucene_7_x_9_x_spark.index.splitter import multi_pass_split_index
    dests = [str(tmp_path / f"mp{i}") for i in range(3)]
    counts = multi_pass_split_index(spark, src, dests)
    assert counts == [10, 10, 10]
    # int_keys => global docNum order == doc_id order, so part i holds
    # exactly the doc_ids ≡ i (mod 3) (split(): (j + numParts - i) % n == 0)
    for i, d in enumerate(dests):
        s = IndexSearcher(spark, d)
        for j in (0, 1, 2, 4, 29):
            assert s.count(Q.TermQuery(f"row{j}")) == (1 if j % 3 == i else 0)
        assert check_index(spark, d) == []


def test_multi_pass_sequential_tail(spark, src, tmp_path):
    from lucene_7_x_9_x_spark.index.splitter import multi_pass_split_index
    dests = [str(tmp_path / f"sq{i}") for i in range(4)]
    counts = multi_pass_split_index(spark, src, dests, seq=True)
    # partLen = 30 // 4 = 7; the LAST part collects the rounding tail
    assert counts == [7, 7, 7, 9]
    s_last = IndexSearcher(spark, dests[-1])
    assert s_last.count(Q.TermQuery("row29")) == 1
    assert s_last.count(Q.TermQuery("row21")) == 1
    assert s_last.count(Q.TermQuery("row20")) == 0


def test_multi_pass_rejects_single_output(spark, src, tmp_path):
    from lucene_7_x_9_x_spark.index.splitter import multi_pass_split_index
    with pytest.raises(ValueError):
        multi_pass_split_index(spark, src, [str(tmp_path / "only")])

"""MemoryIndex analog (memoryindex.py): one-doc multi-field in-RAM index for
percolation (reference memory/.../MemoryIndex.java).

Parity: scores must equal (a) the pure-python OracleIndex on the same one-doc
corpus and (b) the distributed engine on a one-doc index — same float32 BM25
contract everywhere."""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.analysis.tokenizer import STANDARD, Analyzer
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.memoryindex import MemoryIndex
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.oracle import OracleIndex
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOC = "spark builds a memory index for fast percolation of spark queries"


def _oracle_score(q):
    o = OracleIndex(pd.DataFrame(
        [{"segment_id": 0, "docid": 0, "text": DOC}]))
    scored = o._score_tree(q)
    return float(scored.get((0, 0), 0.0))


@pytest.mark.parametrize("q", [
    Q.TermQuery("spark"),
    Q.TermQuery("absent"),
    Q.BooleanQuery(must=(Q.TermQuery("memory"), Q.TermQuery("index"))),
    Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("absent"))),
    Q.PhraseQuery(("memory", "index")),
    Q.PhraseQuery(("spark", "index"), slop=2),
    Q.DisjunctionMaxQuery((Q.TermQuery("spark"), Q.TermQuery("index")),
                          tie_breaker=0.3),
    Q.BoostQuery(Q.TermQuery("spark"), 2.5),
])
def test_matches_oracle_scores(q):
    mi = MemoryIndex().add_field("text", DOC)
    assert mi.search(q) == _oracle_score(q)


def test_matches_distributed_engine(spark, tmp_path):
    idx = str(tmp_path / "one_doc_idx")
    docs = spark.createDataFrame([(0, DOC)], "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", idx, docs_per_segment=4,
                int_keys=True, term_shards=2)
    s = IndexSearcher(spark, idx)
    mi = MemoryIndex().add_field("text", DOC)
    for q in [Q.TermQuery("spark"),
              Q.BooleanQuery(should=(Q.TermQuery("spark"),
                                     Q.TermQuery("memory")))]:
        hits = s.search(q, k=1).hits
        assert np.float32(mi.search(q)) == np.float32(hits.iloc[0].score)


def test_multi_field_routing():
    mi = (MemoryIndex(default_field="body")
          .add_field("title", "breaking news headline")
          .add_field("body", "the long body text mentions spark once"))
    assert mi.matches(Q.TermQuery("headline", field="title"))
    assert not mi.matches(Q.TermQuery("headline", field="body"))
    assert not mi.matches(Q.TermQuery("spark", field="title"))
    assert mi.matches(Q.TermQuery("spark"))  # default field = body
    # cross-field dismax: max of the two per-field scores + tie*rest
    t = mi.search(Q.TermQuery("news", field="title"))
    b = mi.search(Q.TermQuery("spark", field="body"))
    dm = mi.search(Q.DisjunctionMaxQuery(
        (Q.TermQuery("news", field="title"),
         Q.TermQuery("spark", field="body")), tie_breaker=0.5))
    assert dm == pytest.approx(max(t, b) + 0.5 * min(t, b), rel=1e-6)
    # with N=1 avgdl == doclen, so length normalization cancels (same in
    # Lucene's one-doc reader); tf still differentiates per-field scores
    mi2 = (MemoryIndex(default_field="body")
           .add_field("title", "spark spark spark")
           .add_field("body", "spark filler words"))
    assert mi2.search(Q.TermQuery("spark", field="title")) > \
        mi2.search(Q.TermQuery("spark", field="body"))


def test_repeated_add_field_contiguous_positions():
    mi = MemoryIndex().add_field("text", "alpha beta").add_field(
        "text", "gamma delta")
    # positionIncrementGap=0 behavior: phrase across the boundary matches
    assert mi.matches(Q.PhraseQuery(("beta", "gamma")))
    assert mi.matches(Q.PhraseQuery(("alpha", "beta", "gamma", "delta")))


def test_percolate_registry():
    mi = MemoryIndex().add_field("text", DOC)
    registry = {
        "has_spark": Q.TermQuery("spark"),
        "phrase": Q.PhraseQuery(("memory", "index")),
        "miss": Q.TermQuery("zebra"),
        "boolean_miss": Q.BooleanQuery(
            must=(Q.TermQuery("spark"), Q.TermQuery("zebra"))),
        "filter_only": Q.ConstantScoreQuery(Q.TermQuery("percolation"), 3.0),
    }
    out = mi.percolate(registry)
    assert set(out) == {"has_spark", "phrase", "filter_only"}
    assert out["filter_only"] == 3.0
    assert all(v > 0 for v in out.values())


def test_reset_and_custom_analyzer():
    an = Analyzer(stopwords=frozenset({"the"}))
    mi = MemoryIndex(analyzer=an).add_field("text", "the quick fox")
    assert not mi.matches(Q.TermQuery("the"))
    assert mi.matches(Q.TermQuery("quick"))
    mi.reset()
    assert not mi.matches(Q.TermQuery("quick"))
    mi.add_field("text", "entirely new content")
    assert mi.matches(Q.TermQuery("entirely"))


def test_extend_field_with_different_analyzer_raises():
    # round-4 advice: a field's analyzer is pinned by its first add_field;
    # silently tokenizing appended text with the original analyzer is wrong
    import pytest

    an1 = Analyzer(stopwords=frozenset({"the"}))
    an2 = Analyzer(stopwords=frozenset({"a"}))
    mi = MemoryIndex().add_field("text", "alpha beta", analyzer=an1)
    with pytest.raises(ValueError, match="different analyzer"):
        mi.add_field("text", "gamma delta", analyzer=an2)
    # same analyzer object (or none) still extends fine
    mi.add_field("text", "gamma delta", analyzer=an1)
    mi.add_field("text", "epsilon")
    assert mi.matches(Q.TermQuery("epsilon"))

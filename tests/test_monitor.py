"""Monitor / percolator analog (monitor.py) vs the reference module
solr-8.4.0/lucene/monitor.

Covers: TermFilteredPresearcher term extraction (QueryAnalyzer conjunction/
disjunction rules + TermWeightor length weighting + ANYTOKEN fallback), the
presearcher SAFETY invariant (candidates ⊇ matches — verified against the
pure-python OracleIndex over randomized corpora/queries), end-to-end match
parity with the distributed searcher, map-only plan shape (no Exchange), and
selectivity (non-candidate docs are never verified)."""

import random

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.monitor import (
    ANYTOKEN, Monitor, MonitorQuery, anchor_terms)
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.oracle import OracleIndex

DOCS = [
    "spark builds a fast inverted index",
    "the quick brown fox jumps over the lazy dog",
    "fast merge of sorted posting lists",
    "percolation matches stored queries against documents",
    "spark merge spark merge spark",
    "slow scan of every document is wasteful",
    "",
]


# --------------------------------------------------------------------------
# anchor extraction unit rules
# --------------------------------------------------------------------------

def test_anchor_term_and_synonym():
    assert anchor_terms(Q.TermQuery("spark")) == {"spark"}
    assert anchor_terms(Q.SynonymQuery(("fast", "slow"))) == {"fast", "slow"}


def test_anchor_phrase_picks_longest_term():
    # conjunction -> single highest-weighted (longest) term
    assert anchor_terms(Q.PhraseQuery(("a", "inverted", "index"))) == {"inverted"}


def test_anchor_boolean_conjunction_picks_best_child():
    q = Q.BooleanQuery(must=(Q.TermQuery("ab"), Q.TermQuery("abcdef")))
    assert anchor_terms(q) == {"abcdef"}
    # a filter clause is required too
    q2 = Q.BooleanQuery(should=(Q.TermQuery("x"),),
                        filter=(Q.TermQuery("abcdef"),))
    assert anchor_terms(q2) == {"abcdef"}


def test_anchor_boolean_should_unions():
    q = Q.BooleanQuery(should=(Q.TermQuery("fast"), Q.TermQuery("slow")))
    assert anchor_terms(q) == {"fast", "slow"}


def test_anchor_disjunction_poisoned_by_unextractable_child():
    q = Q.BooleanQuery(should=(Q.TermQuery("fast"), Q.PrefixQuery("me")))
    assert anchor_terms(q) == {ANYTOKEN}
    # ... but a conjunction routes around the unextractable child
    q2 = Q.BooleanQuery(must=(Q.TermQuery("fast"), Q.PrefixQuery("me")))
    assert anchor_terms(q2) == {"fast"}


def test_anchor_multiterm_and_matchall_fall_back_to_anytoken():
    for q in (Q.PrefixQuery("sp"), Q.WildcardQuery("s*k"),
              Q.RegexpQuery("s.*"), Q.FuzzyQuery("spark"),
              Q.MatchAllDocsQuery(),
              Q.BooleanQuery(must_not=(Q.TermQuery("x"),))):
        assert anchor_terms(q) == {ANYTOKEN}


def test_anchor_span_shapes():
    near = Q.SpanNearQuery((Q.SpanTermQuery("ab"), Q.SpanTermQuery("abcd")),
                           slop=3)
    assert anchor_terms(near) == {"abcd"}
    assert anchor_terms(Q.SpanOrQuery((Q.SpanTermQuery("a"),
                                       Q.SpanTermQuery("b")))) == {"a", "b"}
    assert anchor_terms(Q.SpanNotQuery(Q.SpanTermQuery("abc"),
                                       Q.SpanTermQuery("zzzz"))) == {"abc"}


def test_anchor_multiphrase_best_slot():
    q = Q.MultiPhraseQuery((("a",), ("inverted", "columnar")))
    # slot 2's weight = min(len) = 8 > slot 1's 1
    assert anchor_terms(q) == {"inverted", "columnar"}


# --------------------------------------------------------------------------
# safety invariant: candidates ⊇ matches (randomized, oracle-checked)
# --------------------------------------------------------------------------

def _random_query(rng, vocab):
    t = lambda: rng.choice(vocab)  # noqa: E731
    kind = rng.randrange(7)
    if kind == 0:
        return Q.TermQuery(t())
    if kind == 1:
        return Q.BooleanQuery(must=(Q.TermQuery(t()), Q.TermQuery(t())))
    if kind == 2:
        return Q.BooleanQuery(should=(Q.TermQuery(t()), Q.TermQuery(t())),
                              minimum_should_match=rng.randrange(1, 3))
    if kind == 3:
        return Q.PhraseQuery((t(), t()), slop=rng.randrange(3))
    if kind == 4:
        return Q.DisjunctionMaxQuery((Q.TermQuery(t()), Q.TermQuery(t())),
                                     tie_breaker=0.2)
    if kind == 5:
        return Q.BooleanQuery(must=(Q.TermQuery(t()),),
                              must_not=(Q.TermQuery(t()),))
    return Q.SpanNearQuery((Q.SpanTermQuery(t()), Q.SpanTermQuery(t())),
                           slop=2, in_order=bool(rng.randrange(2)))


def test_presearcher_safety_invariant_randomized():
    rng = random.Random(7)
    vocab = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]
    docs = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))
            for _ in range(60)]
    oracle = OracleIndex(pd.DataFrame(
        [{"segment_id": 0, "docid": i, "text": d}
         for i, d in enumerate(docs)]))
    for qi in range(80):
        q = _random_query(rng, vocab)
        anchors = anchor_terms(q)
        if isinstance(q, Q.SpanNearQuery):
            # OracleIndex has no span matcher; the conjunction of the span's
            # terms OVER-approximates its match set, and the invariant must
            # hold for the superset too (anchors are necessary conditions).
            terms = Q.span_terms(q)
            matched = {i for i, doc in enumerate(docs)
                       if terms <= set(doc.split())}
        else:
            matched = {d for (_s, d) in oracle._match_set(q)}
        for d in matched:
            doc_terms = set(docs[d].split())
            assert ANYTOKEN in anchors or (doc_terms & anchors), (
                f"query {q} matched doc {d} ({docs[d]!r}) but no anchor "
                f"{sorted(anchors)} present — presearcher would miss it")


# --------------------------------------------------------------------------
# end-to-end distributed match
# --------------------------------------------------------------------------

QUERIES = [
    MonitorQuery("q_term", Q.TermQuery("spark")),
    MonitorQuery("q_and", Q.BooleanQuery(
        must=(Q.TermQuery("fast"), Q.TermQuery("merge")))),
    MonitorQuery("q_or", Q.BooleanQuery(
        should=(Q.TermQuery("fox"), Q.TermQuery("percolation")))),
    MonitorQuery("q_phrase", Q.PhraseQuery(("spark", "merge"))),
    MonitorQuery("q_not", Q.BooleanQuery(
        must=(Q.TermQuery("spark"),), must_not=(Q.TermQuery("merge"),))),
    MonitorQuery("q_wild", Q.WildcardQuery("perc*")),
]


def _expected_pairs():
    oracle = OracleIndex(pd.DataFrame(
        [{"segment_id": 0, "docid": i, "text": d}
         for i, d in enumerate(DOCS)]))
    out = set()
    for mq in QUERIES:
        for (_s, d) in oracle._match_set(mq.query):
            out.add((d, mq.query_id))
    return out


def test_monitor_match_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "doc_id long, text string")
    mon = Monitor(spark)
    mon.register(*QUERIES)
    got = {(int(r["key"]), r["query_id"])
           for r in mon.match(docs).collect()}
    assert got == _expected_pairs()


def test_monitor_match_is_map_only(spark):
    docs = spark.createDataFrame([(0, "spark")], "doc_id long, text string")
    mon = Monitor(spark)
    mon.register(*QUERIES)
    plan = mon.match(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_monitor_scores_match_memoryindex(spark):
    from lucene_7_x_9_x_spark.memoryindex import MemoryIndex
    docs = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "doc_id long, text string")
    mon = Monitor(spark, dtype=np.float64)
    mon.register(*QUERIES)
    rows = mon.match(docs, scores=True).collect()
    assert rows
    by_pair = {(int(r["key"]), r["query_id"]): r["score_micro"] for r in rows}
    for (d, qid), micro in by_pair.items():
        mi = MemoryIndex(dtype=np.float64)
        mi.add_field("text", DOCS[d])
        q = {mq.query_id: mq.query for mq in QUERIES}[qid]
        assert micro == int(np.floor(mi.search(q) * 1e6 + 0.5))


def test_monitor_register_update_delete(spark):
    docs = spark.createDataFrame([(0, "spark merge")],
                                 "doc_id long, text string")
    mon = Monitor(spark)
    mon.register(MonitorQuery("a", Q.TermQuery("spark")))
    assert {r["query_id"] for r in mon.match(docs).collect()} == {"a"}
    # update in place (Monitor.register upserts)
    mon.register(MonitorQuery("a", Q.TermQuery("absent")))
    assert mon.match(docs).count() == 0
    mon.register(MonitorQuery("b", Q.TermQuery("merge")))
    mon.delete_by_id("b")
    assert mon.get_query_count() == 1
    assert mon.match(docs).count() == 0


def test_presearcher_selectivity():
    """Docs without any anchor term are never candidates (the point of the
    presearcher): the inverted view routes only anchor-bearing docs."""
    mon_inv = None
    mon = Monitor.__new__(Monitor)
    mon._queries = {mq.query_id: mq.query for mq in QUERIES[:5]}  # no wild
    mon._anchors = {qid: anchor_terms(q) for qid, q in mon._queries.items()}
    mon_inv = mon.presearcher_index()
    assert ANYTOKEN not in mon_inv
    # a doc about nothing relevant hits zero candidate queries
    doc_terms = {"the", "lazy", "dog"}
    cands = set()
    for t in doc_terms:
        cands.update(mon_inv.get(t, ()))
    assert cands == set()


def test_monitor_percolates_a_stream(spark, tmp_path):
    """The alerting shape the reference module exists for: match() composes
    with Structured Streaming unchanged (mapInPandas is stream-capable) —
    each micro-batch's docs are percolated against the registered queries
    and matches land in the sink."""
    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS) if d],
        "doc_id long, text string").coalesce(1).write.parquet(src)

    mon = Monitor(spark)
    mon.register(*QUERIES[:5])  # deterministic, no ANYTOKEN
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    q = (mon.match(stream)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(int(r["key"]), r["query_id"])
           for r in spark.read.parquet(out).collect()}
    want = {(d, qid) for (d, qid) in _expected_pairs()
            if qid != "q_wild" and DOCS[d]}
    assert got == want

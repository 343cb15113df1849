"""Payload channel (.pay analog): delimited-payload analysis, block encode
round-trip, PayloadScoreQuery aggregates, sparse dot product, merge carry.

Semantics sources (behavior only): PayloadScoreQuery.java /
PayloadFunction.java; .pay channel Lucene84PostingsFormat.java:99-103; demo
LuceneDemo/src/main/java/lucene/AnalyzerTest/PayloadAnalyzer.java."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.analysis.tokenizer import PayloadAnalyzer
from lucene_7_x_9_x_spark.functions.codecs import (
    decode_blocks, encode_posting_list, split_positions)
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
from lucene_7_x_9_x_spark.index.merge import execute_merge
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.operators.payloads import (
    payload_score_topk, payload_sparse_dot_topk)
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


def test_payload_analyzer_tokens():
    a = PayloadAnalyzer()
    items, doclen = a.term_freqs_payloads("a|3 b|7 a|5 c b|0")
    assert doclen == 5
    by_term = {t: (ps, ws) for t, _, ps, ws in items}
    assert by_term["a"] == ([0, 2], [3, 5])
    assert by_term["b"] == ([1, 4], [7, 0])
    assert by_term["c"] == ([3], [0])  # no delimiter -> payload 0


def test_payload_codec_roundtrip():
    rng = np.random.default_rng(7)
    n = 300
    docids = np.cumsum(rng.integers(1, 5, n)).astype(np.int64)
    freqs = rng.integers(1, 4, n).astype(np.int64)
    norms = rng.integers(1, 255, n).astype(np.uint8)
    positions = [np.sort(rng.choice(1000, f, replace=False)).astype(np.int64)
                 for f in freqs]
    payloads = [rng.integers(0, 1 << 20, f).astype(np.int64) for f in freqs]
    blocks = encode_posting_list(docids, freqs, norms, positions,
                                 payloads=payloads)
    d, f, nb, flat_p, flat_pay = decode_blocks(
        blocks, want_positions=True, want_payloads=True)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(f, freqs)
    for got, want in zip(split_positions(flat_pay, f), payloads):
        np.testing.assert_array_equal(got, want)
    # small path (df <= 16)
    blocks = encode_posting_list(docids[:5], freqs[:5], norms[:5],
                                 positions[:5], payloads=payloads[:5])
    *_, flat_pay = decode_blocks(blocks, want_positions=True,
                                 want_payloads=True)
    np.testing.assert_array_equal(
        flat_pay, np.concatenate(payloads[:5]))
    # payload-less blocks decode as zeros
    blocks = encode_posting_list(docids, freqs, norms, positions)
    *_, flat_pay = decode_blocks(blocks, want_positions=True,
                                 want_payloads=True)
    assert flat_pay.sum() == 0 and flat_pay.size == int(freqs.sum())


BASE = [
    (0, "apple|3 pear|1 apple|9"),
    (1, "apple|2 kiwi|4"),
    (2, "pear|8 kiwi|1 apple|5 apple|1"),
    (3, "kiwi|6"),
    (4, "apple|7 pear|2"),
    (5, "plain tokens only"),
]


@pytest.fixture()
def pidx(spark, tmp_path):
    d = str(tmp_path / "pidx")
    docs = spark.createDataFrame(BASE, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d,
                docs_per_segment=2, int_keys=True, term_shards=4,
                analyzer=PayloadAnalyzer())
    return d


def _scores(df):
    return {int(r["key"]): float(r["score"]) for r in df.collect()}


def test_payload_score_functions(spark, pidx):
    s = IndexSearcher(spark, pidx)
    assert _scores(payload_score_topk(s, "apple", "max")) == {
        0: 9.0, 4: 7.0, 2: 5.0, 1: 2.0}
    assert _scores(payload_score_topk(s, "apple", "sum")) == {
        0: 12.0, 4: 7.0, 2: 6.0, 1: 2.0}
    assert _scores(payload_score_topk(s, "apple", "min")) == {
        4: 7.0, 0: 3.0, 1: 2.0, 2: 1.0}
    assert _scores(payload_score_topk(s, "apple", "avg")) == {
        4: 7.0, 0: 6.0, 2: 3.0, 1: 2.0}
    assert _scores(payload_score_topk(s, "tokens", "max")) == {5: 0.0}


def test_payload_sparse_dot(spark, pidx):
    s = IndexSearcher(spark, pidx)
    got = _scores(payload_sparse_dot_topk(s, {"apple": 2.0, "kiwi": 10.0}))
    # doc0: 2*12=24; doc1: 2*2+10*4=44; doc2: 2*6+10*1=22; doc3: 60; doc4: 14
    assert got == {3: 60.0, 1: 44.0, 0: 24.0, 2: 22.0, 4: 14.0}


def test_payloads_survive_merge_and_deletes(spark, pidx):
    w = IndexWriter(spark, pidx, int_keys=True)
    w.delete_documents_by_keys([4])
    segs = [s["segment_id"] for s in IndexCatalog(pidx).live_segments()]
    execute_merge(spark, pidx, segs)
    s = IndexSearcher(spark, pidx)
    assert _scores(payload_score_topk(s, "apple", "sum")) == {
        0: 12.0, 2: 6.0, 1: 2.0}
    got = _scores(payload_sparse_dot_topk(s, {"apple": 2.0, "kiwi": 10.0}))
    assert got == {3: 60.0, 1: 44.0, 0: 24.0, 2: 22.0}

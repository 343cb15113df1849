"""Codec SPI (functions/codecs.py): named encoder registry recorded in the
catalog (Codec.forName semantics) + the PFOR patched-exceptions layout
(PForUtil.java behavior: pack at a small width, patch <= 7 outliers).

Decode is header-self-describing, so mixed-codec indexes merge freely."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions import codecs as C
from lucene_7_x_9_x_spark.index.builder import build_index, load_index_codec
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


# --- PFOR stream layer ------------------------------------------------------

def test_pfor_round_trip_with_exceptions():
    v = np.ones(100, dtype=np.uint64)
    v[[3, 40, 77]] = [50_000, 9_000_000, 2**40]
    v[0] = 2  # defeat the all-ones escape
    buf = C.encode_stream_pfor(v)
    assert buf[0] > 128 and buf[0] != 255, "expected a PFOR header"
    # packed at 1 bit, so the three outliers AND the leading 2 are patched
    assert buf[1] == 4
    out = C.decode_stream(buf, v.size)
    assert (out == v).all()
    # patched beats plain FOR (which must pack everything at 41 bits)
    assert len(buf) < len(C.encode_stream(v))


def test_pfor_falls_back_when_not_beneficial():
    rng = np.random.default_rng(7)
    flat = rng.integers(1, 256, size=128).astype(np.uint64)
    assert C.encode_stream_pfor(flat) == C.encode_stream(flat)
    ones = np.ones(64, dtype=np.uint64)
    assert C.encode_stream_pfor(ones) == C.encode_stream(ones)
    small = np.array([5, 1, 9], dtype=np.uint64)  # < 32: vInt tail either way
    assert C.encode_stream_pfor(small) == C.encode_stream(small)


@pytest.mark.parametrize("seed", range(8))
def test_pfor_randomized_round_trip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(32, 400))
    v = rng.integers(1, 64, size=n).astype(np.uint64)
    n_exc = int(rng.integers(0, 8))
    if n_exc:
        idx = rng.choice(n, size=n_exc, replace=False)
        v[idx] = rng.integers(2**20, 2**50, size=n_exc).astype(np.uint64)
    buf = C.encode_stream_pfor(v)
    assert (C.decode_stream(buf, n) == v).all()


def test_codec_registry_forname():
    assert C.get_codec("for-vbyte") is C.DEFAULT_CODEC
    assert C.get_codec(C.DEFAULT_CODEC) is C.DEFAULT_CODEC
    assert C.get_codec("pfor").name == "pfor"
    with pytest.raises(ValueError, match="unknown codec"):
        C.get_codec("no-such-codec")
    mine = C.register_codec(C.Codec("test-custom", C.encode_stream))
    try:
        assert C.get_codec("test-custom") is mine
    finally:
        del C.CODECS["test-custom"]


def test_vbyte_codec_posting_round_trip():
    docids = np.arange(0, 500, 2)
    freqs = np.full(250, 3)
    norms = np.full(250, 100, dtype=np.uint8)
    for codec in ["for-vbyte", "pfor", "vbyte"]:
        blocks = C.encode_posting_list(docids, freqs, norms, codec=codec)
        d, f, nb = C.decode_blocks(blocks)
        assert (d == docids).all() and (f == freqs).all() and (nb == norms).all()


# --- end-to-end through the index ------------------------------------------

def _skewed_docs(spark):
    # freq outliers inside one 128-block: PFOR patches them
    rows = [(i, "common filler words here") for i in range(200)]
    for i in (7, 65, 130):
        rows[i] = (i, "common " * 200 + "filler words here")
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pfor_index_scores_equal_default(spark, tmp_path):
    docs = _skewed_docs(spark)
    idx_a = str(tmp_path / "idx_default")
    idx_b = str(tmp_path / "idx_pfor")
    build_index(spark, docs, "doc_id", "text", idx_a, docs_per_segment=200,
                int_keys=True, term_shards=4)
    build_index(spark, docs, "doc_id", "text", idx_b, docs_per_segment=200,
                int_keys=True, term_shards=4, codec="pfor")
    assert load_index_codec(idx_b).name == "pfor"
    assert check_index(spark, idx_b) == []
    q = Q.BooleanQuery(should=(Q.TermQuery("common"), Q.TermQuery("filler")))
    a = IndexSearcher(spark, idx_a).search(q, k=10).hits
    b = IndexSearcher(spark, idx_b).search(q, k=10).hits
    assert list(a.key) == list(b.key)
    assert [np.float32(x) for x in a.score] == [np.float32(x) for x in b.score]
    # the pfor index actually used a patched stream somewhere
    import pyspark.sql.functions as F
    blocks = (spark.read.parquet(f"{idx_b}/postings")
              .select(F.explode("blocks").alias("b"))
              .select(F.col("b.freq_bytes").alias("fb")).toPandas())
    headers = {bytes(x)[0] for x in blocks.fb if len(bytes(x))}
    assert any(128 < h < 255 for h in headers), headers


def test_writer_and_merge_keep_recorded_codec(spark, tmp_path):
    idx = str(tmp_path / "idx_pfor_w")
    build_index(spark, _skewed_docs(spark), "doc_id", "text", idx,
                docs_per_segment=60, int_keys=True, term_shards=4,
                codec="pfor")
    w = IndexWriter(spark, idx, int_keys=True, docs_per_segment=60)
    assert w.codec.name == "pfor"
    more = spark.createDataFrame(
        [(1000 + i, "common appended doc") for i in range(5)],
        "doc_id long, text string")
    w.add_documents(more, "doc_id", "text")
    w.delete_documents_by_keys([7])
    w.force_merge(max_segments=1)
    assert check_index(spark, idx) == []
    s = IndexSearcher(spark, idx)
    got = {int(r.key) for r in s.search(Q.TermQuery("appended"),
                                        k=20).hits.itertuples()}
    assert got == {1000 + i for i in range(5)}
    assert s.count(Q.TermQuery("common")) == 204  # 200 + 5 added - 1 deleted

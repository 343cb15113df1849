"""Unit tests for the pure-function kernels (SmallFloat, BM25, codecs).

Mirrors the reference's unit strategy:
  core/src/test/org/apache/lucene/util/TestSmallFloat.java (round-trip + tables)
  core/src/test/org/apache/lucene/codecs/lucene84/TestForDeltaUtil.java, TestPForUtil.java
"""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions import smallfloat as sf
from lucene_7_x_9_x_spark.functions import bm25
from lucene_7_x_9_x_spark.functions import codecs


# ---------- SmallFloat ----------

def test_num_free_values():
    assert sf.NUM_FREE_VALUES == 24


def test_byte4_small_values_exact():
    for i in range(40):
        b = int(sf.int_to_byte4([i])[0])
        assert sf.byte4_to_int([b])[0] == i, i


def test_byte4_round_down_monotone():
    xs = np.unique(np.concatenate([
        np.arange(0, 5000),
        np.logspace(0, 9.3, 4000).astype(np.int64),
    ]))
    enc = sf.int_to_byte4(xs)
    dec = sf.byte4_to_int(enc)
    assert (dec <= xs).all()
    # monotone: encoding order preserved
    assert (np.diff(enc.astype(np.int64)) >= 0).all()
    # round-down to nearest representable: next representable value is > x
    table = sf.BYTE4_DECODE_TABLE
    for x, e in zip(xs[:500], enc[:500]):
        if e < 255:
            assert table[e + 1] > x


def test_byte4_decode_table_spot_values():
    # hand-computed from the reference algorithm
    assert sf.BYTE4_DECODE_TABLE[0] == 0
    assert sf.BYTE4_DECODE_TABLE[23] == 23
    assert sf.BYTE4_DECODE_TABLE[24] == 24  # 24 + int4ToLong(0)
    assert sf.BYTE4_DECODE_TABLE[39] == 39  # 24 + int4ToLong(15) = 24+15
    assert sf.BYTE4_DECODE_TABLE[40] == 24 + 16  # first lossy step
    assert sf.BYTE4_DECODE_TABLE[255] == 24 + ((7 | 8) << 27)


def test_scalar_vector_agree():
    xs = np.arange(0, 100000, 7)
    vec = sf.int_to_byte4(xs)
    for x, v in zip(xs[::97], vec[::97]):
        assert sf._int_to_byte4_scalar(int(x)) == int(v)


# ---------- BM25 ----------

def test_idf_value():
    # idf = ln(1 + (N - n + 0.5)/(n + 0.5))
    v = bm25.idf(1, 1)
    assert v == np.float32(np.log(1.0 + 0.5 / 1.5))
    v = bm25.idf(10, 1000)
    assert abs(float(v) - np.log(1 + (1000 - 10 + 0.5) / 10.5)) < 1e-6


def test_score_monotonicity():
    st = bm25.BM25Stats(doc_count=1000, sum_ttf=250_000)
    w = st.weight(50)
    freqs = np.arange(1, 200)
    norms = np.full(freqs.shape, 30, dtype=np.uint8)
    s = bm25.score_freq_norm(freqs, norms, w, st.cache)
    assert s.dtype == np.float32
    assert (np.diff(s) >= 0).all()  # monotone increasing in freq
    # monotone decreasing in doc length
    s2 = bm25.score_freq_norm(np.full(200, 5), np.arange(1, 201).astype(np.uint8),
                              w, st.cache)
    assert (np.diff(s2) <= 0).all()


def test_float32_stepwise_differs_from_double():
    # sanity: the float32 path is actually float32 (not silently promoted)
    st32 = bm25.BM25Stats(doc_count=12345, sum_ttf=3_456_789)
    st64 = bm25.BM25Stats(doc_count=12345, sum_ttf=3_456_789, dtype=np.float64)
    w32, w64 = st32.weight(321), st64.weight(321)
    s32 = bm25.score_freq_norm([7], [100], w32, st32.cache)
    s64 = bm25.score_freq_norm([7], [100], w64, st64.cache, dtype=np.float64)
    assert s32.dtype == np.float32 and s64.dtype == np.float64
    assert abs(float(s32[0]) - float(s64[0])) < 1e-5


def test_block_max_is_upper_bound():
    st = bm25.BM25Stats(doc_count=5000, sum_ttf=800_000)
    w = st.weight(123)
    rng = np.random.RandomState(42)
    freqs = rng.randint(1, 50, 500)
    norms = rng.randint(1, 255, 500).astype(np.uint8)
    scores = bm25.score_freq_norm(freqs, norms, w, st.cache)
    bound = st.max_score(int(freqs.max()), int(norms.min()), w)
    assert (scores <= bound + 1e-9).all()


# ---------- codecs ----------

def test_vbyte_roundtrip():
    rng = np.random.RandomState(0)
    for n in [0, 1, 5, 1000]:
        v = rng.randint(0, 2**62, n).astype(np.uint64)
        assert (codecs.vbyte_decode(codecs.vbyte_encode(v), n) == v).all()
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**40], dtype=np.uint64)
    assert (codecs.vbyte_decode(codecs.vbyte_encode(v), v.size) == v).all()


def test_pack_bits_roundtrip():
    rng = np.random.RandomState(1)
    for bits in [1, 3, 8, 17, 31, 40]:
        v = rng.randint(0, 2**min(bits, 62), 300).astype(np.uint64)
        v %= np.uint64(2**bits)
        assert (codecs.unpack_bits(codecs.pack_bits(v, bits), 300, bits) == v).all()


def test_encode_stream_all_ones_escape():
    buf = codecs.encode_stream(np.ones(128, dtype=np.uint64))
    assert buf == bytes([0])
    assert (codecs.decode_stream(buf, 128) == 1).all()


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 5003])
def test_posting_list_roundtrip(n):
    rng = np.random.RandomState(n)
    docids = np.cumsum(rng.randint(1, 20, n)).astype(np.int64)
    freqs = rng.randint(1, 300, n).astype(np.int64)
    norms = rng.randint(0, 256, n).astype(np.uint8)
    positions = [np.cumsum(rng.randint(1, 9, f)) - 1 for f in freqs]
    blocks = codecs.encode_posting_list(docids, freqs, norms, positions)
    assert all(b["count"] <= codecs.BLOCK_SIZE for b in blocks)
    assert len(blocks) == (n + 127) // 128
    d, f, nb, flat = codecs.decode_blocks(blocks, want_positions=True)
    assert (d == docids).all()
    assert (f == freqs).all()
    assert (nb == norms).all()
    per_doc = codecs.split_positions(flat, f)
    for got, want in zip(per_doc, positions):
        assert (got == want).all()


def test_block_metadata():
    docids = np.arange(0, 300, 2)
    freqs = np.arange(1, 151)
    norms = (np.arange(150) % 256).astype(np.uint8)
    blocks = codecs.encode_posting_list(docids, freqs, norms)
    b0 = blocks[0]
    assert b0["first_doc"] == 0 and b0["last_doc"] == 254 and b0["count"] == 128
    assert b0["max_freq"] == 128 and b0["min_norm"] == 0
    assert blocks[1]["count"] == 22

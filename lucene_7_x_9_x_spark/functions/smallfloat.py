"""Exact reimplementation of Lucene's SmallFloat 4-bit-mantissa norm quantization.

Semantics source (behavior only, no code copied):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:113-181
  (longToInt4 / int4ToLong / intToByte4 / byte4ToInt)

The quantized byte IS part of the BM25 score (lossy doc length), so this must be
bit-exact: values 0..23 are stored verbatim ("free values"); larger values keep a
4-bit mantissa (1 implicit bit + 3 stored) and a shift, i.e. the largest
representable value <= input (round-down).

Everything here is pure numpy — usable inside Arrow/pandas UDFs and on the driver.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "BYTE4_DECODE_TABLE",
    "LENGTH_TABLE_F32",
    "NUM_FREE_VALUES",
]


def long_to_int4(i: int) -> int:
    """Scalar port of SmallFloat.longToInt4 (SmallFloat.java:113-132)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = int(i).bit_length()
    if num_bits < 4:
        return int(i)
    shift = num_bits - 4
    encoded = (int(i) >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    """Scalar port of SmallFloat.int4ToLong (SmallFloat.java:137-149)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24, SmallFloat.java:151-152


def _int_to_byte4_scalar(i: int) -> int:
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def _byte4_to_int_scalar(b: int) -> int:
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# All 256 decodings, precomputed once (mirrors BM25Similarity's LENGTH_TABLE,
# BM25Similarity.java LENGTH_TABLE static init).
BYTE4_DECODE_TABLE = np.array(
    [_byte4_to_int_scalar(b) for b in range(256)], dtype=np.int64
)
# float32 view used by the BM25 norm-inverse cache (int -> float promotion in Java).
LENGTH_TABLE_F32 = BYTE4_DECODE_TABLE.astype(np.float32)


def int_to_byte4(x) -> np.ndarray:
    """Vectorized SmallFloat.intToByte4 (SmallFloat.java:159-168).

    Accepts any int array-like >= 0; returns uint8 array.
    """
    x = np.asarray(x, dtype=np.int64)
    if x.size and int(x.min()) < 0:
        raise ValueError("Only supports positive values")
    out = np.empty(x.shape, dtype=np.int64)
    small = x < NUM_FREE_VALUES
    out[small] = x[small]
    y = x[~small] - NUM_FREE_VALUES
    if y.size:
        # exact bit_length for y < 2^53 via frexp (doc lengths are < 2^31)
        _, e = np.frexp(y.astype(np.float64))
        num_bits = e.astype(np.int64)  # frexp: y = m * 2^e with 0.5 <= m < 1
        sub = num_bits < 4
        enc = np.empty(y.shape, dtype=np.int64)
        enc[sub] = y[sub]
        shift = num_bits - 4
        ns = ~sub
        enc[ns] = ((y[ns] >> shift[ns]) & 0x07) | ((shift[ns] + 1) << 3)
        out[~small] = NUM_FREE_VALUES + enc
    return out.astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Vectorized SmallFloat.byte4ToInt (SmallFloat.java:173-181)."""
    b = np.asarray(b).astype(np.uint8)
    return BYTE4_DECODE_TABLE[b.astype(np.int64)]

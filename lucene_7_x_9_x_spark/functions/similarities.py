"""Pluggable Similarity implementations beyond BM25 (SURVEY §2.7).

Lucene's extension point is a Similarity subclass (o.a.l/search/similarities/
has 20+: TFIDFSimilarity/ClassicSimilarity, BooleanSimilarity, LMDirichlet,
DFR, ...). Here a Similarity is any object with the BM25Stats interface the
kernels consume:

  doc_count, sum_ttf, dtype
  weight(df, boost) -> scalar term weight
  multi_term_weight(dfs, boost) -> scalar (phrase/synonym/span stats)
  score(freqs, norm_bytes, weight) -> per-posting scores (vectorized numpy)
  max_score(max_freq, min_norm_byte, weight) -> block upper bound (must be
      monotone: nondecreasing in freq, nonincreasing in doc length — this is
      what makes block-max pruning safe for the implementation)

BM25Stats (functions/bm25.py) is the default; this module adds:

  ClassicSimilarity — TF-IDF: idf = 1 + ln((N+1)/(df+1)) (solr-8.4.0
      ClassicSimilarity.java:71), tf = sqrt(freq) (tf()), lengthNorm =
      1/sqrt(dl) — applied to our
      SmallFloat-quantized dl instead of Classic's own byte norm (documented
      divergence: the quantizer differs, the formula does not).
  BooleanSimilarity — score = query boost, tf/length ignored
      (BooleanSimilarity.java).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import BYTE4_DECODE_TABLE
from . import bm25

__all__ = ["ClassicSimilarity", "BooleanSimilarity", "make_similarity"]


class ClassicSimilarity:
    def __init__(self, doc_count: int, sum_ttf: int, dtype=np.float32):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_ttf)
        self.dtype = dtype
        # per-norm-byte cache: 1/sqrt(quantized dl)
        dl = BYTE4_DECODE_TABLE.astype(np.float64)
        with np.errstate(divide="ignore"):
            inv = 1.0 / np.sqrt(dl)
        inv[~np.isfinite(inv)] = 0.0
        self.cache = inv.astype(dtype)

    def _idf(self, df) -> float:
        return float(np.log((self.doc_count + 1.0) / (np.float64(df) + 1.0))
                     + 1.0)

    def weight(self, df: int, boost: float = 1.0):
        return self.dtype(boost * self._idf(df))

    def multi_term_weight(self, dfs, boost: float = 1.0):
        return self.dtype(boost * sum(self._idf(df) for df in dfs))

    def score(self, freqs, norm_bytes, weight):
        dt = self.dtype
        tf = np.sqrt(np.asarray(freqs).astype(dt)).astype(dt)
        ni = self.cache[np.asarray(norm_bytes).astype(np.int64)]
        return (dt(weight) * tf * ni).astype(dt)

    def max_score(self, max_freq: int, min_norm_byte: int, weight):
        return float(self.score(np.array([max_freq]),
                                np.array([min_norm_byte]), weight)[0])


class BooleanSimilarity:
    def __init__(self, doc_count: int, sum_ttf: int, dtype=np.float32):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_ttf)
        self.dtype = dtype

    def weight(self, df: int, boost: float = 1.0):
        return self.dtype(boost)

    def multi_term_weight(self, dfs, boost: float = 1.0):
        return self.dtype(boost)

    def score(self, freqs, norm_bytes, weight):
        return np.full(len(np.asarray(freqs)), self.dtype(weight),
                       dtype=self.dtype)

    def max_score(self, max_freq: int, min_norm_byte: int, weight):
        return float(weight)


_REGISTRY = {
    "bm25": lambda n, ttf, k1, b, dtype: bm25.BM25Stats(n, ttf, k1, b,
                                                        dtype=dtype),
    "classic": lambda n, ttf, k1, b, dtype: ClassicSimilarity(n, ttf, dtype),
    "boolean": lambda n, ttf, k1, b, dtype: BooleanSimilarity(n, ttf, dtype),
}


def make_similarity(name: str, doc_count: int, sum_ttf: int,
                    k1: float = bm25.K1, b: float = bm25.B, dtype=np.float32):
    try:
        return _REGISTRY[name](doc_count, sum_ttf, k1, b, dtype)
    except KeyError:
        raise ValueError(f"unknown similarity {name!r}; "
                         f"have {sorted(_REGISTRY)}") from None

"""BM25 scoring kernel with Lucene-8.4-exact float32 rounding.

Semantics source (behavior only):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java
    :74-76   idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))
    :88-90   avgdl = (float) (sumTotalTermFreq / (double) docCount)
    :185-194 multi-term idf: per-term float idfs summed in double, cast to float
    :201-204 per-norm-byte cache: cache[i] = 1f / (k1 * ((1-b) + b*LENGTH_TABLE[i]/avgdl))
    :252-264 score = weight - weight / (1f + freq * cache[norm]); weight = boost*idf (float)
  Clause-sum precision: per-term scores are float32; conjunction/disjunction sums
  accumulate in double then cast to float (ConjunctionScorer.java:60-66,
  DisjunctionSumScorer / WANDScorer.java:481-490, MinShouldMatchSumScorer.java:326-333).

``dtype`` selects float32 (Lucene bit-parity; default) or float64 (used when the
result is differentially compared against a double-precision SQL oracle).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE_F32, BYTE4_DECODE_TABLE

__all__ = ["K1", "B", "idf", "avg_field_length", "norm_inverse_cache",
           "term_weight", "score_freq_norm", "BM25Stats"]

K1 = 1.2
B = 0.75


def idf(doc_freq, doc_count, dtype=np.float32):
    """idf, computed in double then cast (BM25Similarity.java:74-76).

    Uses log(1 + x) literally (NOT log1p) to match Java's Math.log(1 + x),
    which materializes 1 + x in double first.
    """
    df = np.asarray(doc_freq, dtype=np.float64)
    n = np.float64(doc_count)
    return dtype(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int, dtype=np.float32):
    """avgdl = (float)(sumTotalTermFreq / (double) docCount) (BM25Similarity.java:88-90)."""
    return dtype(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_inverse_cache(avgdl, k1: float = K1, b: float = B, dtype=np.float32):
    """256-entry cache[i] = 1/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl)).

    Every intermediate op in float32 when dtype=float32, mirroring
    BM25Similarity.java:201-204 (Java float arithmetic, LENGTH_TABLE int->float).
    """
    if dtype == np.float32:
        lt = LENGTH_TABLE_F32
        k1f = np.float32(k1)
        bf = np.float32(b)
        one = np.float32(1.0)
        t = (bf * lt).astype(np.float32)
        t = (t / np.float32(avgdl)).astype(np.float32)
        t = ((one - bf) + t).astype(np.float32)
        t = (k1f * t).astype(np.float32)
        return (one / t).astype(np.float32)
    lt = BYTE4_DECODE_TABLE.astype(np.float64)
    return 1.0 / (k1 * ((1.0 - b) + b * lt / np.float64(avgdl)))


def term_weight(df, doc_count, boost: float = 1.0, dtype=np.float32):
    """weight = boost * idf, in float32 (BM25Scorer ctor, BM25Similarity.java:240)."""
    return dtype(dtype(boost) * idf(df, doc_count, dtype=dtype))


def score_freq_norm(freqs, norm_bytes, weight, cache, dtype=np.float32):
    """score = weight - weight / (1 + freq * cache[norm]) (BM25Similarity.java:252-264).

    freqs: int array (term frequency); norm_bytes: uint8 array; weight: scalar.
    Stepwise dtype arithmetic reproduces Java float rounding when dtype=float32.
    """
    ni = cache[np.asarray(norm_bytes).astype(np.int64)]
    f = np.asarray(freqs).astype(dtype)
    w = dtype(weight)
    one = dtype(1.0)
    denom = (one + (f * ni).astype(dtype)).astype(dtype)
    return (w - (w / denom).astype(dtype)).astype(dtype)


class BM25Stats:
    """Per-query immutable stats bundle: N, avgdl, per-term (df, weight) + cache.

    Stats are aggregated across all segments before scoring, mirroring how
    IndexSearcher resolves TermStates over the whole reader
    (solr-8.4.0/.../search/TermQuery.java:140-141).
    """

    def __init__(self, doc_count: int, sum_ttf: int, k1: float = K1, b: float = B,
                 dtype=np.float32):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_ttf)
        self.k1 = k1
        self.b = b
        self.dtype = dtype
        self.avgdl = avg_field_length(sum_ttf, doc_count, dtype=dtype) if doc_count else dtype(0)
        self.cache = norm_inverse_cache(self.avgdl, k1, b, dtype=dtype) if doc_count else None

    def weight(self, df: int, boost: float = 1.0):
        return term_weight(df, self.doc_count, boost, dtype=self.dtype)

    def score(self, freqs, norm_bytes, weight):
        """Vectorized per-posting scores (the pluggable-Similarity surface the
        kernels call — see functions/similarities.py for alternatives)."""
        return score_freq_norm(freqs, norm_bytes, weight, self.cache,
                               dtype=self.dtype)

    def multi_term_weight(self, dfs, boost: float = 1.0):
        """Summed idf for phrase/synonym scoring: float idfs summed in double,
        cast to float (BM25Similarity.java:185-194)."""
        total = np.float64(0.0)
        for df in dfs:
            total += np.float64(idf(df, self.doc_count, dtype=self.dtype))
        return self.dtype(self.dtype(boost) * self.dtype(total))

    def max_score(self, max_freq: int, min_norm_byte: int, weight):
        """Block-max upper bound: score(max_freq, min_norm) — valid since BM25 is
        monotone increasing in freq and decreasing in doc length (the simplified
        impact pair per SURVEY §2.4 / CompetitiveImpactAccumulator semantics)."""
        return float(score_freq_norm(
            np.array([max_freq]), np.array([min_norm_byte]), weight, self.cache,
            dtype=self.dtype)[0])

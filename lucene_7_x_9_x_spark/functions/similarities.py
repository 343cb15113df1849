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
  LMDirichletSimilarity — Dirichlet-smoothed language model
      (LMDirichletSimilarity.java:83-88, default mu=2000):
      boost * (ln(1 + freq/(mu*p)) + ln(mu/(dl+mu))) clamped at 0,
      p = (ttf+1)/(sumTotalTermFreq+1) in double
      (LMSimilarity.DefaultCollectionModel.computeProbability:172-173).
  DFRSimilarity (InL2) — BasicModelIn + AfterEffectL + NormalizationH2(c=1)
      (DFRSimilarity.java:118-121, BasicModelIn.java:38-48,
      NormalizationH2.java:60-61): tfn = freq*log2(1 + c*avgfl/dl),
      score = boost * log2((N+1)/(df+0.5)) * (1 - 1/(1+tfn)).

The SimilarityBase-family scorers compute in double and cast each per-term
score to float32 (SimilarityBase.java:246); multi-term trees sum the float32
per-term scores (MultiSimilarity.MultiSimScorer.score:71-74). Both need the
term's totalTermFreq (LM) — resolved from a per-query `term_ttf` map the
searcher ships in stats_args; absent entries fall back to docFreq, mirroring
BasicStats' docFreq fallback when totalTermFreq is unavailable.
"""

from __future__ import annotations

import numpy as np

from .smallfloat import BYTE4_DECODE_TABLE
from . import bm25

__all__ = ["ClassicSimilarity", "BooleanSimilarity", "DotProductSimilarity",
           "LMDirichletSimilarity", "DFRSimilarityInL2",
           "LMJelinekMercerSimilarity", "AxiomaticF2EXP", "IBSimilarityLLD",
           "make_similarity"]


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


class DotProductSimilarity:
    """Sparse-vector dot-product scoring — the TestSparseKNN1.java demo shape
    (LuceneDemo9.8.0/src/main/java/TestSparseKNN1.java): a sparse vector is
    dimension->weight; stored as the engine's own postings with dimension=term
    and document weight=term frequency, the query weight rides the term boost,
    and score = sum_t q_weight_t * freq. df/norms ignored. Monotone
    nondecreasing in freq, independent of doc length, so WAND block-max
    pruning stays safe (max_score = w * max_freq)."""

    def __init__(self, doc_count: int, sum_ttf: int, dtype=np.float32):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_ttf)
        self.dtype = dtype

    def weight(self, df: int, boost: float = 1.0):
        return self.dtype(boost)

    def multi_term_weight(self, dfs, boost: float = 1.0):
        return self.dtype(boost)

    def score(self, freqs, norm_bytes, weight):
        dt = self.dtype
        return (np.asarray(freqs).astype(dt) * dt(weight)).astype(dt)

    def max_score(self, max_freq: int, min_norm_byte: int, weight):
        return float(weight) * float(max_freq)


class _PerTermStatsSimilarity:
    """Shared plumbing for the SimilarityBase family (SimilarityBase.java):
    a weight is (boost, [per-term stat records]); score() evaluates each
    term's double-math formula, casts to float32 per term, and sums float32
    (MultiSimilarity.MultiSimScorer). Subclasses define _rec (what a term's
    record holds) and _score1 (the per-term double formula incl. boost)."""

    needs_ttf = True  # searcher ships term_ttf in stats_args for these

    def __init__(self, doc_count: int, sum_ttf: int, dtype=np.float32,
                 term_ttf: dict | None = None):
        self.doc_count = int(doc_count)
        self.sum_ttf = int(sum_ttf)
        self.dtype = dtype
        self.term_ttf = term_ttf or {}
        # avgFieldLength = sumTotalTermFreq / (double) docCount
        # (SimilarityBase.fillBasicStats:121)
        self.avgfl = self.sum_ttf / float(max(1, self.doc_count))

    # -- per-term records ----------------------------------------------------
    def _ttf(self, term: str, fallback_df: int) -> int:
        v = self.term_ttf.get(term)
        return int(v) if v is not None else int(fallback_df)

    def _rec(self, df: int, ttf: int):
        raise NotImplementedError

    def _score1(self, f64: np.ndarray, dl64: np.ndarray, rec, boost: float):
        raise NotImplementedError  # double math, boost applied, returns f64

    # -- the kernel-facing weight surface -------------------------------------
    def weight_for_term(self, term: str, df: int, boost: float = 1.0):
        return (float(boost), [self._rec(df, self._ttf(term, df))])

    def multi_term_weight_for_terms(self, terms, dfs, boost: float = 1.0):
        return (float(boost),
                [self._rec(df, self._ttf(t, df))
                 for t, df in zip(terms, dfs)])

    def synonym_weight(self, terms, df: int, boost: float = 1.0):
        # SynonymQuery pseudo-term: df = max(member df), ttf = sum(member ttf)
        # (SynonymQuery.java:233-247)
        ttf = sum(self._ttf(t, 0) for t in terms)
        return (float(boost), [self._rec(df, max(ttf, df))])

    def weight(self, df: int, boost: float = 1.0):
        # ttf-less fallback: BasicStats substitutes docFreq when
        # totalTermFreq is unavailable
        return (float(boost), [self._rec(df, df)])

    def multi_term_weight(self, dfs, boost: float = 1.0):
        return (float(boost), [self._rec(df, df) for df in dfs])

    def score(self, freqs, norm_bytes, weight):
        # per-term double math, cast to dtype per term, dtype-summed
        # (SimilarityBase.java:246 float cast; MultiSimScorer float sum).
        # dtype=float32 is the Lucene-parity contract; float64 is the pure-
        # double oracle-comparison mode, same convention as BM25Stats.
        boost, recs = weight
        dl = BYTE4_DECODE_TABLE[
            np.asarray(norm_bytes).astype(np.int64)].astype(np.float64)
        f64 = np.asarray(freqs).astype(np.float64)
        acc = np.zeros(f64.shape, dtype=self.dtype)
        for rec in recs:
            acc += self._score1(f64, dl, rec, boost).astype(self.dtype)
        return acc

    def max_score(self, max_freq: int, min_norm_byte: int, weight):
        # monotone in freq (up) and doc length (down) for both subclasses,
        # so (max_freq, min_norm) is a safe block upper bound
        return float(self.score(np.array([max_freq]),
                                np.array([min_norm_byte]), weight)[0])


class LMDirichletSimilarity(_PerTermStatsSimilarity):
    """LMDirichletSimilarity.java:83-88 with the default collection model."""

    def __init__(self, doc_count: int, sum_ttf: int, mu: float = 2000.0,
                 dtype=np.float32, term_ttf: dict | None = None):
        super().__init__(doc_count, sum_ttf, dtype, term_ttf)
        self.mu = float(mu)

    def _rec(self, df: int, ttf: int):
        # p(t|C) = (ttf + 1D) / (numberOfFieldTokens + 1D), double math
        # (LMSimilarity.java:172-173)
        return (int(ttf) + 1.0) / (self.sum_ttf + 1.0)

    def _score1(self, f64, dl64, rec, boost):
        s = boost * (np.log1p(f64 / (self.mu * rec))
                     + np.log(self.mu / (dl64 + self.mu)))
        return np.where(s > 0.0, s, 0.0)


class DFRSimilarityInL2(_PerTermStatsSimilarity):
    """DFR I(n)L2: the DFRSimilarity configuration the demos use.

    score = boost * log2((N+1)/(df+0.5)) * (1 - 1/(1+tfn)),
    tfn = freq * log2(1 + c*avgfl/dl), c=1
    (DFRSimilarity.java:118-121; BasicModelIn.java:38-48 — the after-effect L
    folds to the (1 - 1/(1+tfn)) factor; NormalizationH2.java:60-61)."""

    def __init__(self, doc_count: int, sum_ttf: int, c: float = 1.0,
                 dtype=np.float32, term_ttf: dict | None = None):
        super().__init__(doc_count, sum_ttf, dtype, term_ttf)
        self.c = float(c)

    def _rec(self, df: int, ttf: int):
        return int(df)

    def _score1(self, f64, dl64, rec, boost):
        ln2 = np.log(2.0)
        tfn = f64 * (np.log1p(self.c * self.avgfl / dl64) / ln2)
        a = np.log((self.doc_count + 1.0) / (rec + 0.5)) / ln2
        return boost * a * (1.0 - 1.0 / (1.0 + tfn))


class LMJelinekMercerSimilarity(_PerTermStatsSimilarity):
    """Jelinek-Mercer smoothed language model
    (LMJelinekMercerSimilarity.java:70-74):
    score = boost * ln(1 + ((1-lambda)*freq/dl) / (lambda*p(t|C))),
    p(t|C) = (ttf+1)/(sumTotalTermFreq+1). lambda defaults to 0.1, the
    javadoc-recommended value for short (title) queries."""

    def __init__(self, doc_count: int, sum_ttf: int, lam: float = 0.1,
                 dtype=np.float32, term_ttf: dict | None = None):
        super().__init__(doc_count, sum_ttf, dtype, term_ttf)
        if not (0.0 < lam <= 1.0):
            raise ValueError("lambda must be in the range (0 .. 1]")
        self.lam = float(lam)

    def _rec(self, df: int, ttf: int):
        return (int(ttf) + 1.0) / (self.sum_ttf + 1.0)

    def _score1(self, f64, dl64, rec, boost):
        return boost * np.log1p(
            ((1.0 - self.lam) * f64 / dl64) / (self.lam * rec))


class AxiomaticF2EXP(_PerTermStatsSimilarity):
    """Axiomatic F2EXP (AxiomaticF2EXP.java; Axiomatic.java:103 defaults
    s=0.25, k=0.35): score = boost * (freq/(freq + s + s*dl/avgdl)) *
    ((N+1)/df)^k, clamped at 0 (Axiomatic.java:107-115 — the clamp only
    bites for the F3 gamma variants; F2EXP is nonnegative). tf and ln
    components are 1 for F2EXP (AxiomaticF2EXP.java:63-72)."""

    needs_ttf = False  # df-only

    def __init__(self, doc_count: int, sum_ttf: int, s: float = 0.25,
                 k: float = 0.35, dtype=np.float32,
                 term_ttf: dict | None = None):
        super().__init__(doc_count, sum_ttf, dtype, term_ttf)
        self.s = float(s)
        self.k = float(k)

    def _rec(self, df: int, ttf: int):
        return int(df)

    def _score1(self, f64, dl64, rec, boost):
        tfln = f64 / (f64 + self.s + self.s * dl64 / self.avgfl)
        idf = ((self.doc_count + 1.0) / rec) ** self.k
        return boost * tfln * idf


class IBSimilarityLLD(_PerTermStatsSimilarity):
    """Information-based similarity, LL distribution + D lambda + H2 norm
    (IBSimilarity.java:107-112): score = boost * -ln(lam/(tfn+lam)) with
    tfn = freq*log2(1 + c*avgfl/dl), c=1 (NormalizationH2.java:60-61) and
    lam = (df+1)/(N+1) (LambdaDF.java:36-42; the ==1 nextDown guard only
    matters for SPL). DistributionLL.java:37-38 uses the NATURAL log."""

    needs_ttf = False  # df-only

    def __init__(self, doc_count: int, sum_ttf: int, c: float = 1.0,
                 dtype=np.float32, term_ttf: dict | None = None):
        super().__init__(doc_count, sum_ttf, dtype, term_ttf)
        self.c = float(c)

    def _rec(self, df: int, ttf: int):
        # float32 lambda (LambdaDF.lambda returns float)
        return float(np.float32((df + 1.0) / (self.doc_count + 1.0)))

    def _score1(self, f64, dl64, rec, boost):
        tfn = f64 * (np.log1p(self.c * self.avgfl / dl64) / np.log(2.0))
        return boost * -np.log(rec / (tfn + rec))


_REGISTRY = {
    "bm25": lambda n, ttf, k1, b, dtype, tt: bm25.BM25Stats(n, ttf, k1, b,
                                                            dtype=dtype),
    "classic": lambda n, ttf, k1, b, dtype, tt: ClassicSimilarity(n, ttf,
                                                                  dtype),
    "boolean": lambda n, ttf, k1, b, dtype, tt: BooleanSimilarity(n, ttf,
                                                                  dtype),
    "lmdirichlet": lambda n, ttf, k1, b, dtype, tt: LMDirichletSimilarity(
        n, ttf, dtype=dtype, term_ttf=tt),
    "dfr_inl2": lambda n, ttf, k1, b, dtype, tt: DFRSimilarityInL2(
        n, ttf, dtype=dtype, term_ttf=tt),
    "dot": lambda n, ttf, k1, b, dtype, tt: DotProductSimilarity(n, ttf,
                                                                 dtype),
    "lmjelinekmercer": lambda n, ttf, k1, b, dtype, tt:
        LMJelinekMercerSimilarity(n, ttf, dtype=dtype, term_ttf=tt),
    "axiomatic_f2exp": lambda n, ttf, k1, b, dtype, tt:
        AxiomaticF2EXP(n, ttf, dtype=dtype, term_ttf=tt),
    "ib_ll_d": lambda n, ttf, k1, b, dtype, tt:
        IBSimilarityLLD(n, ttf, dtype=dtype, term_ttf=tt),
}

# similarities whose scoring needs per-term totalTermFreq resolved up front
NEEDS_TTF = frozenset(
    name for name, mk in _REGISTRY.items()
    if getattr(mk(2, 2, bm25.K1, bm25.B, np.float32, None), "needs_ttf",
               False))


def make_similarity(name: str, doc_count: int, sum_ttf: int,
                    k1: float = bm25.K1, b: float = bm25.B, dtype=np.float32,
                    term_ttf: dict | None = None):
    try:
        return _REGISTRY[name](doc_count, sum_ttf, k1, b, dtype, term_ttf)
    except KeyError:
        raise ValueError(f"unknown similarity {name!r}; "
                         f"have {sorted(_REGISTRY)}") from None

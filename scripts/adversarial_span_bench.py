"""Adversarial worst case for the span/sloppy pairwise window cut.

The candidate cut (kernel._pair_window_cut) removes docs whose closest
(term-a, term-b) position pair exceeds the slop window before the faithful
per-doc Python matcher runs. Round-3's open question: a corpus where the cut
does NOT discriminate (the pair co-occurs within slop in ~every doc — "new
york" over NYC news) sends ~all candidates into per-doc Python. This bench
quantifies that bound.

Three seeded corpora, same size/shape (driver-side kernel only — no Spark,
so the numbers isolate matcher cost from job overhead):
  discriminating — both terms in every doc, ~1/3 within slop (the cut's
                   design case; mirrors tests/test_span_prefilter.py)
  adversarial    — "new york( city)" adjacent in EVERY doc (cut keeps ~100%)
  adversarial-hi — additionally high tf (8 tuples/doc): worst per-doc cost

For each: matcher invocations + wall with the cut on vs off, for the 2-term
shapes (sloppy phrase slop=2, ordered span near slop=2) AND the 3-term
shapes (round-5 k-stream walks: sloppy3 slop=4, ordered + unordered
span_near3 slop=4) — `vec` rows must show matcher_calls == 0.
Prints one JSON line; append the table row to BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from lucene_7_x_9_x_spark.functions import bm25, smallfloat  # noqa: E402
from lucene_7_x_9_x_spark.functions.codecs import encode_posting_list  # noqa: E402
from lucene_7_x_9_x_spark.search import kernel as K  # noqa: E402
from lucene_7_x_9_x_spark.search import query as Q  # noqa: E402
from lucene_7_x_9_x_spark.search import sloppy as SL  # noqa: E402

import os

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
DOC_LEN = 60
REPS = int(os.environ.get("SPAN_BENCH_REPS", "3"))


def _encode(docs_tokens):
    """Encode once per corpus; per-rep segments re-wrap the same rows (the
    SegmentIndex decode memo is per-instance, so a fresh wrap == cold cache
    without paying the posting-list encode 3x per variant)."""
    postings = {}
    norms = {}
    for docid, toks in docs_tokens.items():
        norms[docid] = int(smallfloat.int_to_byte4([len(toks)])[0])
        per = {}
        for pos, t in enumerate(toks):
            per.setdefault(t, []).append(pos)
        for t, ps in per.items():
            postings.setdefault(t, []).append((docid, len(ps), ps))
    rows, gdf = {}, {}
    for t, lst in postings.items():
        lst.sort()
        d = np.array([x[0] for x in lst], dtype=np.int64)
        f = np.array([x[1] for x in lst], dtype=np.int64)
        nb = np.array([norms[x[0]] for x in lst], dtype=np.uint8)
        ps = [np.array(x[2], dtype=np.int64) for x in lst]
        rows[t] = {"df": int(d.size), "ttf": int(f.sum()),
                   "blocks": encode_posting_list(d, f, nb, ps)}
        gdf[t] = int(d.size)
    return rows, gdf, max(docs_tokens) + 1


def make_corpus(kind: str, n: int) -> dict:
    rng = np.random.RandomState(42)
    docs = {}
    for i in range(n):
        toks = [f"w{rng.randint(50)}" for _ in range(DOC_LEN)]
        if kind == "discriminating":
            j = rng.randint(10)
            toks[j] = "new"
            if i % 3 == 0:
                toks[j + 1 + rng.randint(2)] = "york"
            else:
                toks[40 + rng.randint(10)] = "york"
        elif kind == "adversarial":
            j = rng.randint(DOC_LEN - 3)
            toks[j], toks[j + 1], toks[j + 2] = "new", "york", "city"
        elif kind == "adversarial-hi":
            for p in range(8):  # 8 adjacent tuples per doc
                j = 2 + p * 7
                toks[j], toks[j + 1], toks[j + 2] = "new", "york", "city"
        if kind == "discriminating":
            toks[50 + rng.randint(10)] = "city"
        docs[i] = toks
    return docs


def run(kind: str):
    docs = make_corpus(kind, N_DOCS)
    rows, gdf, max_doc = _encode(docs)
    stats = bm25.BM25Stats(N_DOCS, N_DOCS * DOC_LEN, dtype=np.float64)
    out = {}
    shapes = {
        "sloppy": Q.PhraseQuery(("new", "york"), slop=2),
        "span_near": Q.SpanNearQuery(
            (Q.SpanTermQuery("new"), Q.SpanTermQuery("york")),
            slop=2, in_order=True),
        "sloppy3": Q.PhraseQuery(("new", "york", "city"), slop=4),
        "span_near3": Q.SpanNearQuery(
            (Q.SpanTermQuery("new"), Q.SpanTermQuery("york"),
             Q.SpanTermQuery("city")), slop=4, in_order=True),
        "span_near3_un": Q.SpanNearQuery(
            (Q.SpanTermQuery("new"), Q.SpanTermQuery("york"),
             Q.SpanTermQuery("city")), slop=4, in_order=False),
        # round 5d: Or-of-terms clause (SpanMultiTermQueryWrapper-in-Near
        # shape) riding the merged-stream walk
        "span_near_or": Q.SpanNearQuery(
            (Q.SpanOrQuery((Q.SpanTermQuery("new"),
                            Q.SpanTermQuery("city"))),
             Q.SpanTermQuery("york")), slop=2, in_order=True),
    }
    for name, q in shapes.items():
        # sloppy runs three variants: the vectorized 2-term walk (new
        # default), and the per-doc matcher with/without the window cut;
        # spans keep the two cut variants (walk applies to phrases only)
        variants = (("vec", True, True), ("cut", False, True),
                    ("nocut", False, False))
        for vname, use_vec, cut in variants:
            calls = {"n": 0}
            orig_spans = K.Scorer._doc_spans
            orig_freq = SL.SloppyPhraseMatcher.freq

            def spy_spans(self, qq, doc, _o=orig_spans):
                calls["n"] += 1
                return _o(self, qq, doc)

            def spy_freq(self, plists, dtype=np.float32, _o=orig_freq):
                calls["n"] += 1
                return _o(self, plists, dtype=dtype)

            K.Scorer._doc_spans = spy_spans
            SL.SloppyPhraseMatcher.freq = spy_freq
            walls = []
            try:
                for _ in range(REPS):
                    seg = K.SegmentIndex(rows, max_doc)  # fresh decode cache
                    sc = K.Scorer(seg, stats, gdf)
                    sc.span_prefilter = cut
                    sc.sloppy_2term_vectorized = use_vec
                    sc.span_near_2term_vectorized = use_vec
                    sc.sloppy_kterm_vectorized = use_vec
                    sc.span_near_kterm_vectorized = use_vec
                    sc.span_near_group_vectorized = use_vec
                    calls["n"] = 0
                    t0 = time.time()
                    if isinstance(q, Q.SpanQuery):
                        d, _ = sc.eval_spans(q)
                    else:
                        d, _ = sc._phrase_freqs(q)
                    walls.append(time.time() - t0)
                key = f"{name}_{vname}"
                out[key] = {
                    "matcher_calls": calls["n"],
                    "matches": int(d.size),
                    "wall_s": round(sorted(walls)[len(walls) // 2], 3),
                }
            finally:
                K.Scorer._doc_spans = orig_spans
                SL.SloppyPhraseMatcher.freq = orig_freq
    return out


def main():
    res = {"n_docs": N_DOCS, "doc_len": DOC_LEN}
    for kind in ("discriminating", "adversarial", "adversarial-hi"):
        res[kind] = run(kind)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

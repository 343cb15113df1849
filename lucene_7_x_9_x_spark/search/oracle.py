"""Pure-Python Lucene-semantics oracle (CheckHits analog) — NO Spark, NO codecs.

Independent exhaustive implementation used to validate the distributed engine:
builds naive in-memory postings from (segment_id, docid, text) rows and scores a
query tree with the same float32 BM25 contract (functions/bm25.py, itself pinned
by unit goldens). Mirrors test-framework/.../search/CheckHits.java:85,159,187 —
run the same query two ways, require identical doc sets and scores.

Intentionally shares ONLY the scalar scoring formulas with the engine; postings
storage, match evaluation, and top-k are separate straight-line code.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from ..analysis.tokenizer import Analyzer, STANDARD
from ..functions import bm25, smallfloat
from . import query as Q
from . import rewrite


class OracleIndex:
    def __init__(self, docs: pd.DataFrame, analyzer: Analyzer = STANDARD,
                 dtype=np.float32, k1: float = bm25.K1, b: float = bm25.B):
        """docs: columns (segment_id, docid, text) [+ key]."""
        self.analyzer = analyzer
        self.dtype = dtype
        self.postings = defaultdict(list)   # term -> [(seg, docid, freq, positions)]
        self.norm = {}                      # (seg, docid) -> norm byte
        self.doclen = {}
        doc_count = 0
        sum_ttf = 0
        self.all_docs = []
        for r in docs.itertuples():
            toks = analyzer.tokenize(r.text)
            self.all_docs.append((r.segment_id, r.docid))
            per = defaultdict(list)
            for term, pos in toks:
                per[term].append(pos)
            n = len(toks)
            self.doclen[(r.segment_id, r.docid)] = n
            self.norm[(r.segment_id, r.docid)] = int(
                smallfloat.int_to_byte4([n])[0])
            if n > 0:
                doc_count += 1
                sum_ttf += n
            for term, ps in per.items():
                self.postings[term].append((r.segment_id, r.docid, len(ps), ps))
        self.stats = bm25.BM25Stats(doc_count, sum_ttf, k1, b, dtype=dtype)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    # ---- scoring (recursive, dict-of-doc based) -----------------------------
    def _score_tree(self, q: Q.Query, boost_factor: float = 1.0):
        """Returns {(seg, docid): float32 score} for scoring, and the match set."""
        dt = self.dtype
        st = self.stats
        if isinstance(q, Q.BoostQuery):
            return self._score_tree(q.query, boost_factor * q.boost)
        if isinstance(q, Q.TermQuery):
            w = st.weight(self.df(q.term), q.boost * boost_factor)
            out = {}
            for seg, docid, freq, _ in self.postings.get(q.term, ()):
                s = bm25.score_freq_norm([freq], [self.norm[(seg, docid)]], w,
                                         st.cache, dtype=dt)[0]
                out[(seg, docid)] = dt(s)
            return out
        if isinstance(q, Q.SynonymQuery):
            dfm = max((self.df(t) for t in q.terms), default=0)
            w = st.weight(dfm, q.boost * boost_factor)
            freqs = defaultdict(int)
            for t in q.terms:
                for seg, docid, freq, _ in self.postings.get(t, ()):
                    freqs[(seg, docid)] += freq
            return {
                key: dt(bm25.score_freq_norm([f], [self.norm[key]], w,
                                             st.cache, dtype=dt)[0])
                for key, f in freqs.items()
            }
        if isinstance(q, Q.PhraseQuery):
            w = st.multi_term_weight([self.df(t) for t in q.terms],
                                     q.boost * boost_factor)
            pfreq = self._phrase_freqs(q)
            return {
                key: dt(bm25.score_freq_norm([f], [self.norm[key]], w,
                                             st.cache, dtype=dt)[0])
                for key, f in pfreq.items()
            }
        if isinstance(q, Q.ConstantScoreQuery):
            m = self._match_set(q.query)
            val = dt(q.boost * boost_factor)
            return {key: val for key in m}
        if isinstance(q, Q.MatchAllDocsQuery):
            val = dt(q.boost * boost_factor)
            return {key: val for key in self.all_docs}
        if isinstance(q, Q.MatchNoDocsQuery):
            return {}
        if isinstance(q, Q.TermInSetQuery):
            val = dt(q.boost * boost_factor)
            return {key: val for key in self._match_set(q)}
        if isinstance(q, Q.DisjunctionMaxQuery):
            subs = [self._score_tree(s, boost_factor) for s in q.queries]
            keys = set().union(*[set(s) for s in subs]) if subs else set()
            out = {}
            for key in keys:
                vals = [s[key] for s in subs if key in s]
                mx = max(vals)
                sm = float(np.sum(np.float64(vals)))
                out[key] = dt(mx + (sm - mx) * q.tie_breaker)
            return out
        if isinstance(q, Q.MULTI_TERM_TYPES):
            # CONSTANT_SCORE rewrite against this index's own vocabulary
            # (MultiTermQuery.java:66-68) — the one-doc/in-RAM vocab is tiny,
            # so eager expansion is exactly what MemoryIndex does too.
            return self._score_tree(
                rewrite.expand_multi_term(q, sorted(self.postings)),
                boost_factor)
        if isinstance(q, Q.BooleanQuery):
            must = [self._score_tree(s, boost_factor) for s in q.must]
            should = [self._score_tree(s, boost_factor) for s in q.should]
            filt = [self._match_set(s) for s in q.filter]
            nots = [self._match_set(s) for s in q.must_not]
            if q.must or q.filter:
                cand = None
                for m in [set(m) for m in must] + [set(f) for f in filt]:
                    cand = m if cand is None else cand & m
            else:
                cand = set()
                for s in should:
                    cand |= set(s)
            msm = q.minimum_should_match
            if msm > 0 or not (q.must or q.filter):
                need = max(1, msm) if not (q.must or q.filter) else msm
                cand = {key for key in cand
                        if sum(1 for s in should if key in s) >= need}
            for n in nots:
                cand -= n
            out = {}
            for key in cand:
                req = np.float64(0.0)
                for m in must:
                    req += np.float64(m[key])
                req32 = self.dtype(req)
                opt_present = any(key in s for s in should)
                if should and opt_present:
                    opt = np.float64(0.0)
                    for s in should:
                        if key in s:
                            opt += np.float64(s[key])
                    opt32 = self.dtype(opt)
                    out[key] = self.dtype(req32 + opt32) if q.must else opt32
                else:
                    out[key] = req32
            return out
        raise TypeError(type(q))

    def _match_set(self, q: Q.Query) -> set:
        if isinstance(q, Q.TermQuery):
            return {(s, d) for s, d, _, _ in self.postings.get(q.term, ())}
        if isinstance(q, Q.TermInSetQuery):
            out = set()
            for t in q.terms:
                out |= {(s, d) for s, d, _, _ in self.postings.get(t, ())}
            return out
        if isinstance(q, Q.SynonymQuery):
            return self._match_set(Q.TermInSetQuery(q.terms))
        if isinstance(q, Q.PhraseQuery):
            return set(self._phrase_freqs(q))
        if isinstance(q, Q.ConstantScoreQuery):
            return self._match_set(q.query)
        if isinstance(q, Q.MatchAllDocsQuery):
            return set(self.all_docs)
        if isinstance(q, Q.MatchNoDocsQuery):
            return set()
        if isinstance(q, (Q.BooleanQuery, Q.DisjunctionMaxQuery)):
            return set(self._score_tree(q))
        if isinstance(q, Q.MULTI_TERM_TYPES):
            return self._match_set(
                rewrite.expand_multi_term(q, sorted(self.postings)))
        if isinstance(q, Q.BoostQuery):
            return self._match_set(q.query)
        raise TypeError(type(q))

    def _phrase_freqs(self, q: Q.PhraseQuery) -> dict:
        per_term = []
        for t in q.terms:
            per_term.append({(s, d): ps for s, d, _, ps in self.postings.get(t, ())})
        cand = set(per_term[0])
        for m in per_term[1:]:
            cand &= set(m)
        out = {}
        for key in cand:
            if q.slop == 0:
                base = set(per_term[0][key])
                for j in range(1, len(per_term)):
                    nxt = set(per_term[j][key])
                    base = {p for p in base if p + j in nxt}
                if base:
                    out[key] = len(base)
            else:
                if len(q.terms) != 2 or q.terms[0] == q.terms[1]:
                    raise NotImplementedError(
                        "oracle sloppy phrases: 2 distinct terms only")
                # Closed-form leader walk equivalent to SloppyPhraseMatcher
                # for two distinct terms (derived independently of
                # search/sloppy.py): adjust positions by query offset; the
                # first leader is the larger of the two lists' first elements
                # (tie: the offset-1 term leads, mirroring PhraseQueue pop
                # order); each leader pairs with max{other <= leader} for one
                # weight-1/(1+gap) match candidate (counted when gap<=slop),
                # then the walk jumps to min{other > leader}.
                lists = (sorted(per_term[0][key]),
                         sorted(p - 1 for p in per_term[1][key]))
                lead_lst = 0 if (lists[0][0], 0) > (lists[1][0], 1) else 1
                qpos = lists[lead_lst][0]
                f = self.dtype(0.0)
                while True:
                    other = lists[1 - lead_lst]
                    partner = max(p for p in other if p <= qpos)
                    gap = qpos - partner
                    if gap <= q.slop:
                        f = self.dtype(
                            f + self.dtype(1.0) / self.dtype(1.0 + gap))
                    nxt = [p for p in other if p > qpos]
                    if not nxt:
                        break
                    qpos = nxt[0]
                    lead_lst = 1 - lead_lst
                if f > 0:
                    out[key] = float(f)
        return out

    def top_k(self, q: Q.Query, k: int = 10):
        """Exhaustive top-k with Lucene tie-break: score desc, then segment
        order, then docid (HitQueue.java:74-78 + TopDocs.java:80-83).
        Returns list of (segment_id, docid, score_float)."""
        scored = self._score_tree(q)
        rows = sorted(scored.items(), key=lambda kv: (-float(kv[1]), kv[0][0],
                                                      kv[0][1]))
        return [(seg, docid, float(s)) for (seg, docid), s in rows[:k]], len(rows)

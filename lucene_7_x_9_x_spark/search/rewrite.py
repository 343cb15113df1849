"""Query rewriting: Boolean simplification + MultiTermQuery expansion.

Mirrors IndexSearcher's fixpoint rewrite loop (IndexSearcher.java:710-714) and:
  * BooleanQuery simplifications (BooleanQuery.java:255-312): 0 clauses ->
    MatchNoDocs, single SHOULD/MUST inline, pure-negative -> MatchNoDocs.
  * MultiTermQuery -> CONSTANT_SCORE rewrite (MultiTermQuery.java:66-68, the
    default): expand matching terms from the term dictionary, wrap as a
    constant-score TermInSet disjunction. Wildcard/Regexp/Prefix/Range/Fuzzy
    matching happens against the *term dictionary* (our term-partitioned postings
    table), never by scanning documents.
"""

from __future__ import annotations

import fnmatch
import re

from . import query as Q


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Banded edit distance <= k (FuzzyQuery.java:57-67 automaton semantics)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - k)
        hi = min(len(b), i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cb = b[j - 1]
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        if hi < len(b):
            cur[hi + 1 :] = [k + 1] * (len(b) - hi)
        if min(cur[lo - 1 : hi + 1] + [prev[-1]]) > k:
            return False
        prev = cur
    return prev[-1] <= k


def expand_multi_term(q: Q.Query, vocabulary) -> Q.Query:
    """Expand one MultiTermQuery node against a sorted term list."""
    if isinstance(q, Q.PrefixQuery):
        terms = [t for t in vocabulary if t.startswith(q.prefix)]
    elif isinstance(q, Q.WildcardQuery):
        rx = re.compile(fnmatch.translate(q.pattern))
        terms = [t for t in vocabulary if rx.match(t)]
    elif isinstance(q, Q.RegexpQuery):
        # Lucene regexps are anchored (RegexpQuery.java)
        rx = re.compile(q.regexp)
        terms = [t for t in vocabulary if rx.fullmatch(t)]
    elif isinstance(q, Q.FuzzyQuery):
        pre = q.term[: q.prefix_length]
        terms = [
            t for t in vocabulary
            if t.startswith(pre) and _levenshtein_leq(t, q.term, q.max_edits)
        ]
    elif isinstance(q, Q.TermRangeQuery):
        terms = []
        for t in vocabulary:
            if q.lower is not None:
                if t < q.lower or (t == q.lower and not q.include_lower):
                    continue
            if q.upper is not None:
                if t > q.upper or (t == q.upper and not q.include_upper):
                    continue
            terms.append(t)
    elif isinstance(q, Q.TermInSetQuery):
        vocab = set(vocabulary)
        terms = [t for t in q.terms if t in vocab]
    else:
        return q
    if not terms:
        return Q.MatchNoDocsQuery()
    # CONSTANT_SCORE rewrite (MultiTermQuery.java:66-68)
    return Q.ConstantScoreQuery(Q.TermInSetQuery(tuple(sorted(terms))), boost=q.boost)


def rewrite(q: Q.Query, vocabulary=None) -> Q.Query:
    """Fixpoint rewrite. `vocabulary` (sorted term list) is required only when the
    tree contains MultiTermQuery nodes; the searcher supplies it lazily."""
    for _ in range(16):  # fixpoint with a safety bound
        new = _rewrite_once(q, vocabulary)
        if new == q:
            return q
        q = new
    return q


def _rewrite_once(q: Q.Query, vocabulary):
    if isinstance(q, Q.MULTI_TERM_TYPES):
        if isinstance(q, Q.TermInSetQuery) and vocabulary is None:
            return q  # directly executable by the kernel (isin on postings)
        if vocabulary is None:
            raise ValueError("multi-term query requires the term dictionary")
        return expand_multi_term(q, vocabulary)
    if isinstance(q, Q.BoostQuery):
        inner = _rewrite_once(q.query, vocabulary)
        if q.boost == 1.0:
            return inner
        if isinstance(inner, Q.TermQuery):
            return Q.TermQuery(inner.term, boost=inner.boost * q.boost)
        if isinstance(inner, Q.ConstantScoreQuery):
            return Q.ConstantScoreQuery(inner.query, boost=inner.boost * q.boost)
        return Q.BoostQuery(inner, q.boost)
    if isinstance(q, Q.ConstantScoreQuery):
        return Q.ConstantScoreQuery(_rewrite_once(q.query, vocabulary), q.boost)
    if isinstance(q, Q.DisjunctionMaxQuery):
        subs = tuple(_rewrite_once(s, vocabulary) for s in q.queries)
        subs = tuple(s for s in subs if not isinstance(s, Q.MatchNoDocsQuery))
        if not subs:
            return Q.MatchNoDocsQuery()
        if len(subs) == 1:
            return subs[0]
        return Q.DisjunctionMaxQuery(subs, q.tie_breaker)
    if isinstance(q, Q.BooleanQuery):
        must = tuple(_rewrite_once(s, vocabulary) for s in q.must)
        should = tuple(_rewrite_once(s, vocabulary) for s in q.should)
        must_not = tuple(_rewrite_once(s, vocabulary) for s in q.must_not)
        filt = tuple(_rewrite_once(s, vocabulary) for s in q.filter)
        # a MatchNoDocs MUST/FILTER clause kills the query (BooleanQuery.java:257)
        if any(isinstance(s, Q.MatchNoDocsQuery) for s in must + filt):
            return Q.MatchNoDocsQuery()
        should = tuple(s for s in should if not isinstance(s, Q.MatchNoDocsQuery))
        must_not = tuple(s for s in must_not if not isinstance(s, Q.MatchNoDocsQuery))
        if not must and not should and not filt:
            return Q.MatchNoDocsQuery()  # pure negative matches nothing
        if q.minimum_should_match > len(should) and not (q.minimum_should_match == 0):
            if should or q.minimum_should_match > 0:
                if q.minimum_should_match > len(should):
                    return Q.MatchNoDocsQuery()
        # single-clause inline (BooleanQuery rewrite)
        if (len(must) == 1 and not should and not must_not and not filt
                and q.boost == 1.0):
            return must[0]
        if (len(should) == 1 and not must and not must_not and not filt
                and q.minimum_should_match <= 1 and q.boost == 1.0):
            return should[0]
        return Q.BooleanQuery(must, should, must_not, filt,
                              q.minimum_should_match, q.boost)
    return q

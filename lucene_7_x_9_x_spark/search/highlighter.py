"""Highlighter: mark query-term matches in stored text, pick best fragments.

Semantics source (behavior only): lucene/highlighter module — Highlighter +
SimpleHTMLFormatter + SimpleFragmenter (the demo dependency,
LuceneDemo/pom.xml:27): re-analyze the stored text, wrap matched terms in
pre/post tags, split into ~fragment_size-char fragments, return the top
fragments by number of matched terms.

Runs as a vectorized pandas UDF over the hit set only (highlighting happens
AFTER top-k, so at scale this touches k rows per query, never the corpus).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.tokenizer import _TOKEN_RE, Analyzer, STANDARD
from . import query as Q

__all__ = ["highlight_text", "highlight_df", "query_terms"]


def query_terms(q: Q.Query) -> set:
    """Highlightable terms of a (rewritten) query — scoring terms only
    (MUST_NOT terms never highlight)."""
    if isinstance(q, Q.TermQuery):
        return {q.term}
    if isinstance(q, (Q.PhraseQuery, Q.SynonymQuery, Q.TermInSetQuery)):
        return set(q.terms)
    if isinstance(q, Q.BooleanQuery):
        out: set = set()
        for sub in q.must + q.should + q.filter:
            out |= query_terms(sub)
        return out
    if isinstance(q, Q.DisjunctionMaxQuery):
        out = set()
        for sub in q.queries:
            out |= query_terms(sub)
        return out
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return query_terms(q.query)
    if isinstance(q, Q.PrefixQuery):
        return set()  # expanded forms unknown here; rewrite before highlighting
    return set()


def highlight_text(text: str, terms: Iterable[str],
                   pre_tag: str = "<b>", post_tag: str = "</b>",
                   fragment_size: int = 100, max_fragments: int = 3,
                   analyzer: Analyzer = STANDARD) -> list[str]:
    """Return up to max_fragments highlighted fragments, best-first.

    Fragmenting mirrors SimpleFragmenter: contiguous ~fragment_size-char
    windows aligned to token boundaries; fragment score = matched-term count;
    ties broken by position (earlier first)."""
    if not text:
        return []
    terms = {t.lower() for t in terms}
    spans = []  # (start, end, is_match)
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        tok_l = tok.lower() if analyzer.lowercase else tok
        spans.append((m.start(), m.end(), tok_l in terms))
    if not spans:
        return []

    # build fragments of ~fragment_size chars aligned to token starts
    fragments = []  # (score, order, frag_start, frag_end)
    cur_start = 0
    cur_score = 0
    last_end = 0
    order = 0
    for (s, e, hit) in spans:
        if e - cur_start > fragment_size and last_end > cur_start:
            fragments.append((cur_score, order, cur_start, last_end))
            order += 1
            cur_start = s
            cur_score = 0
        cur_score += int(hit)
        last_end = e
    fragments.append((cur_score, order, cur_start, len(text)))

    best = sorted(fragments, key=lambda x: (-x[0], x[1]))[:max_fragments]
    best = [f for f in best if f[0] > 0] or best[:1]

    out = []
    for _score, _order, fs, fe in best:
        frag_matches = [(s, e) for (s, e, hit) in spans
                        if hit and s >= fs and e <= fe]
        buf = []
        pos = fs
        for (s, e) in frag_matches:
            buf.append(text[pos:s])
            buf.append(pre_tag)
            buf.append(text[s:e])
            buf.append(post_tag)
            pos = e
        buf.append(text[pos:fe])
        out.append("".join(buf))
    return out


def highlight_df(hits: DataFrame, text_col: str, q: Q.Query,
                 pre_tag: str = "<b>", post_tag: str = "</b>",
                 fragment_size: int = 100, max_fragments: int = 3,
                 analyzer: Analyzer = STANDARD,
                 out_col: str = "fragments") -> DataFrame:
    """Add a `fragments: array<string>` column to a hits DataFrame."""
    terms = sorted(query_terms(q))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def hl(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: highlight_text(
            t or "", terms, pre_tag, post_tag, fragment_size, max_fragments,
            analyzer))

    return hits.withColumn(out_col, hl(F.col(text_col)))

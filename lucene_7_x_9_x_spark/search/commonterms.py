"""CommonTermsQuery analog (reference: solr-8.4.0/lucene/queries/src/java/
org/apache/lucene/queries/CommonTermsQuery.java).

Terms are split by docFreq against ``max_term_frequency`` (an absolute count
when >= 1, else ceil(fraction * maxDoc) — buildQuery:117-128): the rare
terms form the low-frequency group, the stopword-like ones the
high-frequency group. The rewrite (buildQuery:129-175) is

    BooleanQuery(
        must   = [Boost(Boolean(lowFreqOccur over low terms,  low msm), lowBoost)],
        should = [Boost(Boolean(highFreqOccur over high terms, high msm), highBoost)])

so high-frequency terms contribute to ranking but never drive matching —
the query never iterates a stopword's full postings list for docs that
match no rare term. When the low group is empty the high group is promoted
to a MUST conjunction (buildQuery:131-139, "prevent slow queries"), unless
a high msm or MUST occur was configured.

The df lookups ride the searcher's memoized per-term stats (bounded driver
rows, one per query term); the produced tree executes on the existing
nested-boolean kernel with block-max pruning intact.
"""

from __future__ import annotations

import math

from . import query as Q

__all__ = ["common_terms_query"]


def common_terms_query(searcher, terms, max_term_frequency: float = 0.01,
                       low_freq_occur: str = "should",
                       high_freq_occur: str = "should",
                       low_freq_min_should_match: int = 0,
                       high_freq_min_should_match: int = 0,
                       low_freq_boost: float = 1.0,
                       high_freq_boost: float = 1.0) -> Q.Query:
    """Build the rewritten query for ``terms`` against ``searcher``'s stats."""
    if low_freq_occur == "must_not" or high_freq_occur == "must_not":
        raise ValueError("Occur should be MUST or SHOULD but was MUST_NOT")
    terms = tuple(terms)
    gdf = searcher._global_df(list(terms))
    max_doc = searcher.doc_count
    cutoff = (max_term_frequency if max_term_frequency >= 1.0
              else math.ceil(max_term_frequency * max_doc))
    low = [t for t in terms if gdf.get(t, 0) <= cutoff]
    high = [t for t in terms if gdf.get(t, 0) > cutoff]

    def _group(ts, occur, msm):
        tq = tuple(Q.TermQuery(t) for t in ts)
        if occur == "must":
            return Q.BooleanQuery(must=tq)
        return Q.BooleanQuery(should=tq, minimum_should_match=msm)

    if not low:
        # high-only: promote to conjunction unless msm/MUST already binds it
        occur = high_freq_occur
        if high_freq_min_should_match == 0 and occur != "must":
            occur = "must"
        if not high:
            return Q.MatchNoDocsQuery()
        return Q.BoostQuery(
            _group(high, occur, high_freq_min_should_match), high_freq_boost)
    must = (Q.BoostQuery(
        _group(low, low_freq_occur, low_freq_min_should_match),
        low_freq_boost),)
    should = ()
    if high:
        should = (Q.BoostQuery(
            _group(high, high_freq_occur, high_freq_min_should_match),
            high_freq_boost),)
    return Q.BooleanQuery(must=must, should=should)

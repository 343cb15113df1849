"""QueryBuilder analog: analyzed-text -> query construction helpers.

Semantics source (behavior only):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/util/QueryBuilder.java
  (createBooleanQuery / createPhraseQuery / createMinShouldMatchQuery — the
  programmatic counterpart of the classic QueryParser, used by demo
  LuceneDemo/src/main/java/lucene/query/QueryBuilderTest.java)

The builder runs the query text through the SAME Analyzer used at index time
and assembles the corresponding query object:

- one token            -> TermQuery (QueryBuilder.java:343-349)
- several tokens       -> BooleanQuery with every token as MUST or SHOULD per
                          the requested operator (QueryBuilder.java:351-377)
- createPhraseQuery    -> PhraseQuery over the analyzed tokens, preserving
                          analyzer position increments (stop-word holes widen
                          the effective gap exactly as the token positions say)
- createMinShouldMatchQuery(fraction) -> SHOULD query with
                          minimumNumberShouldMatch = int(fraction * #clauses)
                          (QueryBuilder.java:272-292: values <= 0 or >= 1 are
                          meaningless and skip the msm constraint)

No Spark work happens here — the output is a plain query tree; all execution
stays on the searcher's distributed kernels.
"""

from __future__ import annotations

from ..analysis.tokenizer import Analyzer, STANDARD
from . import query as Q

__all__ = ["create_boolean_query", "create_phrase_query",
           "create_min_should_match_query"]


def _analyzed_terms(analyzer: Analyzer, text: str) -> list:
    """(term, position) pairs of the analyzed text, position-ordered."""
    return sorted(analyzer.tokenize(text), key=lambda tp: (tp[1], tp[0]))


def create_boolean_query(text: str, operator: str = "should",
                         analyzer: Analyzer = STANDARD,
                         field: str | None = None) -> Q.Query:
    """Analyze ``text``; one token becomes a TermQuery, several become a
    BooleanQuery whose clauses all carry ``operator`` ('should' or 'must')."""
    if operator not in ("should", "must"):
        raise ValueError(f"operator must be 'should' or 'must': {operator!r}")
    terms = [t for t, _ in _analyzed_terms(analyzer, text)]
    if not terms:
        return Q.MatchNoDocsQuery()
    if len(terms) == 1:
        return Q.TermQuery(terms[0], field=field)
    clauses = tuple(Q.TermQuery(t, field=field) for t in terms)
    if operator == "must":
        return Q.BooleanQuery(must=clauses)
    return Q.BooleanQuery(should=clauses)


def create_phrase_query(text: str, slop: int = 0,
                        analyzer: Analyzer = STANDARD,
                        field: str | None = None) -> Q.Query:
    """Analyze ``text`` into a PhraseQuery. Analyzer position holes (stop
    words) survive into the phrase positions via MultiPhraseQuery slots when
    gaps exist; the common gapless case builds a plain PhraseQuery."""
    pairs = _analyzed_terms(analyzer, text)
    if not pairs:
        return Q.MatchNoDocsQuery()
    if len(pairs) == 1:
        return Q.TermQuery(pairs[0][0], field=field)
    positions = [p for _, p in pairs]
    gapless = positions == list(range(positions[0], positions[0] + len(pairs)))
    if gapless:
        return Q.PhraseQuery(tuple(t for t, _ in pairs), slop=slop,
                             field=field)
    # position holes: widen slop by the dropped increments, the
    # QueryBuilder.analyzePhrase behavior when enablePositionIncrements is
    # on and the phrase has no per-position alternatives
    span = positions[-1] - positions[0]
    hole_slop = span - (len(pairs) - 1)
    return Q.PhraseQuery(tuple(t for t, _ in pairs), slop=slop + hole_slop,
                         field=field)


def create_min_should_match_query(text: str, fraction: float,
                                  analyzer: Analyzer = STANDARD,
                                  field: str | None = None) -> Q.Query:
    """SHOULD disjunction over the analyzed tokens with
    minimumNumberShouldMatch = int(fraction * #clauses); fractions outside
    (0, 1) leave the plain disjunction (QueryBuilder.java:272-292)."""
    q = create_boolean_query(text, "should", analyzer, field)
    if not isinstance(q, Q.BooleanQuery):
        return q
    if not (0.0 < fraction < 1.0):
        return q
    msm = int(fraction * len(q.should))
    if msm < 1:
        return q
    return Q.BooleanQuery(should=q.should, minimum_should_match=msm)

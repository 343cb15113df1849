"""Monitor (percolator / reverse-search) analog.

Reference module: solr-8.4.0/lucene/monitor — Monitor.java (register
MonitorQuery instances, match document batches against them),
TermFilteredPresearcher.java (queries are indexed by terms extracted from
them, and a document is only checked against queries whose extracted terms
it contains; queries that defeat extraction index the ANYTOKEN sentinel and
are checked against every document), QueryAnalyzer.java / QueryTree.java
(conjunctions are represented by their single highest-weighted child,
disjunctions by the union of their children), TermWeightor.java (DEFAULT
weights terms by token length — longer tokens are assumed rarer),
CandidateMatcher.java / QueryMatch (per-candidate verification against a
one-document in-RAM index of the incoming document).

Spark-first shape
-----------------
``Monitor.match(docs)`` is ONE map-only pass (``mapInPandas``) over the
document DataFrame — no shuffle, no driver round-trips per document:

- the registered query set (query trees + the term->query_ids presearcher
  index) ships to executors as a broadcast, exactly the in-RAM QueryIndex
  role (Monitor keeps its query index in a RAM directory by default);
- each task tokenizes its documents once, looks candidate query ids up in
  the broadcast term index (the presearcher's disjunction-over-doc-terms
  match), and verifies ONLY the candidates against a MemoryIndex of the
  document (CandidateMatcher.matchQuery) — the same
  tokenize -> presearch -> verify cost model as the reference;
- output is (key, query_id) match rows, streaming out of the map task.

At 100 TB the document side is the big one and it never shuffles; the query
side is metadata-scale (a broadcast of 10^4-10^6 stored queries, the
published Luwak/monitor operating range). For query sets beyond broadcast
size the presearcher index would become a parquet table joined on term —
the same plan the suggesters use — but the broadcast path is the right
default and the one the reference's architecture mirrors.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .analysis.tokenizer import Analyzer, STANDARD
from .memoryindex import MemoryIndex
from .search import query as Q

__all__ = ["MonitorQuery", "Monitor", "anchor_terms", "ANYTOKEN"]

# TermFilteredPresearcher.ANYTOKEN — indexed for queries whose structure
# defeats term extraction; matches every document.
ANYTOKEN = "__ANYTOKEN__"
_ANYSET = frozenset({ANYTOKEN})


@dataclass(frozen=True)
class MonitorQuery:
    """MonitorQuery.java: an id + the query to watch for."""
    query_id: str
    query: Q.Query


def _weight(terms: frozenset) -> float:
    """Weight of a candidate representation set. TermWeightor.DEFAULT weights
    a term by its token length; a SET of terms (a disjunction that must be
    wholly indexed) is only as selective as its weakest member, so the set
    weight is the min (QueryTree disjunction weight = min over children)."""
    if ANYTOKEN in terms:
        return -1.0
    return float(min(len(t) for t in terms))


def _best(sets: list[frozenset]) -> frozenset:
    """Conjunction rule (QueryTree.conjunction + TermWeightor): the query is
    represented by its single highest-weighted child. Deterministic
    tie-break on the sorted term tuple."""
    return max(sets, key=lambda s: (_weight(s), tuple(sorted(s, reverse=True))))


def _union(sets: list[frozenset]) -> frozenset:
    """Disjunction rule: every child must be represented; one unextractable
    child poisons the union to ANYTOKEN (the doc-term disjunction could
    otherwise miss a match through that child)."""
    out: set = set()
    for s in sets:
        if ANYTOKEN in s:
            return _ANYSET
        out |= s
    return frozenset(out) if out else _ANYSET


def anchor_terms(q: Q.Query) -> frozenset:
    """Extract the presearcher term representation of ``q``
    (QueryAnalyzer.buildTree + TermFilteredPresearcher.buildQuery): a
    document can match ``q`` only if it contains at least one returned term.
    ``frozenset({ANYTOKEN})`` = check against every document.

    Guarantee (the presearcher safety invariant, proven in tests): the
    candidate set is a superset of the match set — extraction only ever
    picks terms that are NECESSARY for a match somewhere in the tree.
    """
    if isinstance(q, (Q.TermQuery, Q.SpanTermQuery)):
        return frozenset({q.term})
    if isinstance(q, (Q.SynonymQuery, Q.TermInSetQuery)):
        return frozenset(q.terms) if q.terms else _ANYSET
    if isinstance(q, Q.BlendedTermQuery):
        return frozenset(t for t, _ in q.terms_boosts) or _ANYSET
    if isinstance(q, Q.PhraseQuery):
        # every phrase term is required: keep the highest-weighted one
        return _best([frozenset({t}) for t in q.terms]) if q.terms else _ANYSET
    if isinstance(q, Q.MultiPhraseQuery):
        # conjunction over slots, each slot a disjunction of alternatives
        return _best([frozenset(s) for s in q.slots if s]) if q.slots else _ANYSET
    if isinstance(q, Q.BooleanQuery):
        conj = [anchor_terms(s) for s in (q.must + q.filter)]
        conj = [s for s in conj if s]  # defensive
        if conj:
            return _best(conj)
        if q.should:
            return _union([anchor_terms(s) for s in q.should])
        return _ANYSET  # pure must_not / empty: matches docs w/o any term
    if isinstance(q, Q.DisjunctionMaxQuery):
        return _union([anchor_terms(s) for s in q.queries])
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return anchor_terms(q.query)
    if isinstance(q, Q.SpanNearQuery):
        return _best([anchor_terms(c) for c in q.clauses]) if q.clauses else _ANYSET
    if isinstance(q, Q.SpanOrQuery):
        return _union([anchor_terms(c) for c in q.clauses])
    if isinstance(q, Q.SpanNotQuery):
        return anchor_terms(q.include)  # exclude is not a necessary condition
    if isinstance(q, (Q.SpanFirstQuery, Q.SpanPositionRangeQuery)):
        return anchor_terms(q.match)
    if isinstance(q, (Q.SpanContainingQuery, Q.SpanWithinQuery)):
        return _best([anchor_terms(q.big), anchor_terms(q.little)])
    if isinstance(q, Q.FieldMaskingSpanQuery):
        return anchor_terms(q.query)
    # MatchAll, MultiTermQuery family (prefix/wildcard/regexp/fuzzy/range),
    # and anything else defeats term extraction -> ANYTOKEN fallback
    # (TermFilteredPresearcher handles these via CustomQueryHandlers; the
    # default without a handler is the ANYTOKEN field).
    return _ANYSET


class Monitor:
    """Monitor.java analog: a registry of stored queries plus a distributed
    document matcher. Registration is driver-side (queries are metadata);
    matching is a map-only Spark pass."""

    def __init__(self, spark: SparkSession, analyzer: Analyzer = STANDARD,
                 default_field: str = "text", dtype=np.float64):
        self.spark = spark
        self.analyzer = analyzer
        self.default_field = default_field
        self.dtype = dtype
        self._queries: dict[str, Q.Query] = {}
        self._anchors: dict[str, frozenset] = {}

    # --- registry (Monitor.register / deleteById / clear) -------------------
    def register(self, *mqs: MonitorQuery) -> None:
        """Upsert: re-registering an id replaces its query (Monitor.update)."""
        for mq in mqs:
            self._queries[mq.query_id] = mq.query
            self._anchors[mq.query_id] = anchor_terms(mq.query)

    def delete_by_id(self, *query_ids: str) -> None:
        for qid in query_ids:
            self._queries.pop(qid, None)
            self._anchors.pop(qid, None)

    def clear(self) -> None:
        self._queries.clear()
        self._anchors.clear()

    def get_query_count(self) -> int:
        return len(self._queries)

    def presearcher_index(self) -> dict[str, tuple[str, ...]]:
        """term -> sorted query ids, the QueryIndex's inverted view (plus the
        ANYTOKEN posting). Exposed for tests and debugging."""
        inv: dict[str, set] = {}
        for qid, terms in self._anchors.items():
            for t in terms:
                inv.setdefault(t, set()).add(qid)
        return {t: tuple(sorted(qs)) for t, qs in inv.items()}

    # --- matching (Monitor.match(Document..., MatcherFactory)) --------------
    def match(self, docs: DataFrame, key_col: str = "doc_id",
              text_col: str = "text", scores: bool = False) -> DataFrame:
        """All (document, registered query) match pairs, one map-only pass.

        scores=False -> QueryMatch.SIMPLE_MATCHER (presence only);
        scores=True adds the MemoryIndex BM25 score of the doc for the query
        (ScoringMatch.DEFAULT_MATCHER), micro-rounded like the contract
        entries."""
        inv = self.presearcher_index()
        queries = dict(self._queries)
        analyzer = self.analyzer
        default_field = self.default_field
        dtype = self.dtype
        bc = self.spark.sparkContext.broadcast((inv, queries))

        key_field = docs.schema[key_col]
        fields = [T.StructField("key", key_field.dataType),
                  T.StructField("query_id", T.StringType())]
        if scores:
            fields.append(T.StructField("score_micro", T.LongType()))
        out_schema = T.StructType(fields)

        def _match_batches(batches):
            inv_l, queries_l = bc.value
            any_qids = set(inv_l.get(ANYTOKEN, ()))
            mi = MemoryIndex(analyzer=analyzer, default_field=default_field,
                             dtype=dtype)
            for pdf in batches:
                keys, qids, scs = [], [], []
                for key, text in zip(pdf[key_col], pdf[text_col]):
                    toks = {t for t, _ in analyzer.tokenize(text or "")}
                    cand = set(any_qids)
                    for t in toks:
                        hit = inv_l.get(t)
                        if hit:
                            cand.update(hit)
                    if not cand:
                        continue
                    mi.reset()
                    mi.add_field(default_field, text or "",
                                 analyzer=analyzer)
                    for qid in cand:
                        q = queries_l[qid]
                        if scores:
                            s = mi.search(q)
                            if s > 0.0 or mi.matches(q):
                                keys.append(key)
                                qids.append(qid)
                                scs.append(int(np.floor(s * 1e6 + 0.5)))
                        elif mi.matches(q):
                            keys.append(key)
                            qids.append(qid)
                data = {"key": keys, "query_id": qids}
                if scores:
                    data["score_micro"] = pd.Series(scs, dtype="int64")
                yield pd.DataFrame(data)

        return docs.select(key_col, text_col).mapInPandas(
            _match_batches, schema=out_schema)

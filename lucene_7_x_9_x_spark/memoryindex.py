"""MemoryIndex analog: a single-document, in-RAM, multi-field index for
percolation-style matching (reference: memory/src/java/org/apache/lucene/
index/memory/MemoryIndex.java — addField/search over one document, e.g.
matching a stream of stored queries against each incoming document).

No Spark involved by design: Lucene's MemoryIndex exists precisely because
spinning up the full index machinery per document is wasteful. Here each
field is a one-doc ``OracleIndex`` (search/oracle.py — the same float32 BM25
contract the distributed engine is validated against), and a routing shim
dispatches field-qualified leaves while reusing the oracle's Boolean /
DisMax / boost combination logic unchanged. Collection statistics are
per-field with N=1, matching Lucene's one-doc reader: a TermQuery scores
idf(df=1, N=1) * tf-saturation(doclen of that field).

Repeated ``add_field`` calls on the same name append with contiguous
positions (Lucene with positionIncrementGap=0) — a phrase may match across
the boundary, as in the reference default.

Typical percolation loop over a Spark stream stays executor-side: build the
MemoryIndex inside ``mapInPandas`` per document and evaluate the (broadcast)
stored query set against it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analysis.tokenizer import Analyzer, STANDARD
from .search import query as Q
from .search.oracle import OracleIndex

__all__ = ["MemoryIndex"]

# leaves that carry a field and are resolved against a single field's index
# (the MultiTermQuery family expands against that field's one-doc vocabulary
# inside OracleIndex — MemoryIndex supports them like Lucene's does)
_FIELD_LEAVES = (Q.TermQuery, Q.SynonymQuery, Q.PhraseQuery,
                 Q.TermInSetQuery) + Q.MULTI_TERM_TYPES


class _FieldRoutingOracle(OracleIndex):
    """Routes field-qualified leaf queries to that field's one-doc oracle and
    reuses OracleIndex's combination semantics (Boolean MUST/SHOULD/FILTER/
    MUST_NOT with minimum_should_match, DisjunctionMax tie-breaking, boosts)
    for everything else — the recursion re-enters this router, so nested
    trees mix fields freely."""

    def __init__(self, fields: dict[str, OracleIndex], default_field: str,
                 dtype):
        # deliberately no super().__init__: this index holds no postings of
        # its own, only routes into the per-field ones
        self._fields = fields
        self._default = default_field
        self.dtype = dtype
        self.all_docs = [(0, 0)] if fields else []
        # combination code reads self.stats only inside leaf branches, which
        # are all intercepted below; point it anywhere valid
        self.stats = next(iter(fields.values())).stats if fields else None

    def _leaf_oracle(self, q: Q.Query) -> OracleIndex | None:
        return self._fields.get(getattr(q, "field", None) or self._default)

    def _score_tree(self, q: Q.Query, boost_factor: float = 1.0):
        if isinstance(q, _FIELD_LEAVES):
            o = self._leaf_oracle(q)
            return o._score_tree(q, boost_factor) if o is not None else {}
        return super()._score_tree(q, boost_factor)

    def _match_set(self, q: Q.Query) -> set:
        if isinstance(q, _FIELD_LEAVES):
            o = self._leaf_oracle(q)
            return o._match_set(q) if o is not None else set()
        return super()._match_set(q)


class MemoryIndex:
    def __init__(self, analyzer: Analyzer = STANDARD,
                 default_field: str = "text", dtype=np.float32):
        self.analyzer = analyzer
        self.default_field = default_field
        self.dtype = dtype
        self._texts: dict[str, str] = {}
        self._analyzers: dict[str, Analyzer] = {}
        self._router: _FieldRoutingOracle | None = None

    # --- building ----------------------------------------------------------
    def add_field(self, name: str, text: str,
                  analyzer: Analyzer | None = None) -> "MemoryIndex":
        """Add (or extend) a field. Returns self for chaining.

        A field's analyzer is fixed by its FIRST add_field call; extending
        the field with a DIFFERENT analyzer raises — silently tokenizing the
        appended text with the original analyzer would be wrong, and Lucene's
        MemoryIndex has no per-call analyzer switch either (the whole field
        re-tokenizes through one TokenStream)."""
        if name in self._texts:
            if analyzer is not None and analyzer is not self._analyzers[name]:
                raise ValueError(
                    f"field {name!r} was added with a different analyzer; "
                    "extending a field cannot switch analyzers")
            self._texts[name] = self._texts[name] + " " + text
        else:
            self._texts[name] = text
            self._analyzers[name] = analyzer or self.analyzer
        self._router = None
        return self

    def reset(self) -> None:
        """Clear all fields for reuse on the next document (MemoryIndex.reset)."""
        self._texts.clear()
        self._analyzers.clear()
        self._router = None

    def _build(self) -> _FieldRoutingOracle:
        if self._router is None:
            fields = {
                name: OracleIndex(
                    pd.DataFrame([{"segment_id": 0, "docid": 0, "text": t}]),
                    analyzer=self._analyzers[name], dtype=self.dtype)
                for name, t in self._texts.items()
            }
            self._router = _FieldRoutingOracle(fields, self.default_field,
                                               self.dtype)
        return self._router

    # --- searching ---------------------------------------------------------
    def search(self, q: Q.Query) -> float:
        """BM25 score of the document for `q`; 0.0 when it does not match
        (MemoryIndex.search contract)."""
        scored = self._build()._score_tree(q)
        return float(scored.get((0, 0), 0.0))

    def matches(self, q: Q.Query) -> bool:
        return (0, 0) in self._build()._match_set(q)

    def percolate(self, queries: dict[str, Q.Query]) -> dict[str, float]:
        """Evaluate a registry of stored queries; returns {name: score} for
        the ones that match — the percolator pattern."""
        out = {}
        for name, q in queries.items():
            s = self.search(q)
            if s > 0.0 or ((0, 0) in self._build()._match_set(q)):
                out[name] = s
        return out

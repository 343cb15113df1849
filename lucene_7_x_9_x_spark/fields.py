"""Fielded-term encoding shared by builder, kernel, and searcher.

Lucene keeps per-field postings/norms/stats in per-field Blocktree + NumericDoc
values files (document/Document.java:42-44, index/FieldInfo.java,
BM25Similarity.java:74-90 — N/avgdl/df are all *field* statistics). Our flat
postings table gets the same separation by prefixing every term with its field
name and an unprintable separator: `field\\x1fterm`. The encoding preserves the
properties the engine relies on:

  * prefix/range predicates stay pushable (a field's terms are one contiguous
    lexicographic range, so row-group term min/max pruning still works — the
    per-field Blocktree role);
  * the kernel recovers the field (and therefore the field's BM25 stats and
    norms) from the term string alone — no side channel through applyInPandas;
  * single-field indexes keep bare terms (separator absent), so the encoding
    is fully backward compatible.

No module dependencies: the kernel (pure numpy, no Spark imports) uses this.
"""

from __future__ import annotations

FIELD_SEP = "\x1f"  # unit separator: never produced by the analyzer
# exclusive upper bound of a field's term range: chr(0x1f + 1)
FIELD_RANGE_END = "\x20"


def qualify(field: str, term: str) -> str:
    return field + FIELD_SEP + term


def field_of(term: str, default: str = "") -> str:
    i = term.find(FIELD_SEP)
    return term[:i] if i >= 0 else default


def bare_term(term: str) -> str:
    i = term.find(FIELD_SEP)
    return term[i + 1:] if i >= 0 else term

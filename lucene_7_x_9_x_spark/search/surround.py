"""Surround query language parser.

Reference: queryparser/src/java/org/apache/lucene/queryparser/surround/ —
span-oriented proximity operators with infix and prefix forms
(parser/QueryParser.jj grammar doc: "W is ordered, and N is unordered. The
distance is 1 by default"), where a distance operator becomes
``new SpanNearQuery(spanClauses, opDistance - 1, ordered)``
(query/DistanceQuery.java:106) and AND/OR/NOT compose booleans. Truncated
terms (``appro*``, ``mis?pelled``) inside a distance operator expand via
the span wrapper (query/SrndTruncQuery.java + SpanNearClauseFactory); OR
inside a distance operator becomes SpanOr. AND/NOT are not allowed inside
a distance operator (DistanceQuery.distanceSubQueryNotAllowed) — we raise
the same way.

Grammar subset (case-insensitive operators, left-associative):

    query    := orExpr
    orExpr   := andExpr (OR andExpr)*
    andExpr  := notExpr (AND notExpr)*
    notExpr  := distExpr (NOT distExpr)*
    distExpr := primary (([n]W | [n]N) primary)*    # folds into one near
    primary  := '(' query ')' | OP '(' query, ... ')' | term
    OP       := [n]W | [n]N | AND | OR

Consecutive identical distance operators fold into a single n-clause
SpanNearQuery, exactly like the infix DistanceQuery over an operand list.
"""

from __future__ import annotations

import re

from . import query as Q

__all__ = ["parse_surround"]

_TOKEN = re.compile(r"\s*(\(|\)|,|[^\s(),]+)")


def _tokens(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def _dist_op(tok: str):
    """'w'/'3w' -> (3, True); 'n'/'2n' -> (2, False); else None."""
    m = re.fullmatch(r"(\d*)([wn])", tok, re.IGNORECASE)
    if not m:
        return None
    dist = int(m.group(1)) if m.group(1) else 1
    return dist, m.group(2).lower() == "w"


def _to_span(q: Q.Query) -> Q.SpanQuery:
    """SpanNearClauseFactory role: distance-operator operands must convert
    to span queries; AND/NOT inside a distance op is the reference's
    distanceSubQueryNotAllowed error."""
    if isinstance(q, Q.SpanQuery):
        return q
    if isinstance(q, Q.TermQuery):
        return Q.SpanTermQuery(q.term, q.boost, q.field)
    if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery)):
        return Q.SpanMultiTermQueryWrapper(q)
    if isinstance(q, Q.BooleanQuery) and q.should and not (
            q.must or q.must_not or q.filter):
        return Q.SpanOrQuery(tuple(_to_span(c) for c in q.should))
    raise ValueError(
        f"distance operator does not allow {type(q).__name__} as a "
        "subquery (surround: distanceSubQueryNotAllowed)")


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of surround query")
        self.i += 1
        return t

    # --- precedence ladder ---------------------------------------------
    def or_expr(self) -> Q.Query:
        parts = [self.and_expr()]
        while (self.peek() or "").upper() == "OR":
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        if all(isinstance(p, Q.SpanQuery) for p in parts):
            return Q.SpanOrQuery(tuple(parts))
        return Q.BooleanQuery(should=tuple(parts), minimum_should_match=1)

    def and_expr(self) -> Q.Query:
        parts = [self.not_expr()]
        while (self.peek() or "").upper() == "AND":
            self.next()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return Q.BooleanQuery(must=tuple(parts))

    def not_expr(self) -> Q.Query:
        q = self.dist_expr()
        while (self.peek() or "").upper() == "NOT":
            self.next()
            rhs = self.dist_expr()
            if isinstance(q, Q.SpanQuery) and isinstance(rhs, Q.SpanQuery):
                q = Q.SpanNotQuery(q, rhs)
            else:
                q = Q.BooleanQuery(must=(q,), must_not=(rhs,))
        return q

    def dist_expr(self) -> Q.Query:
        q = self.primary()
        while True:
            t = self.peek()
            op = _dist_op(t) if t else None
            if op is None:
                return q
            dist, ordered = op
            clauses = [_to_span(q)]
            # fold a chain of the SAME operator into one n-clause near
            # (infix DistanceQuery composes the whole operand list)
            while True:
                t = self.peek()
                nxt = _dist_op(t) if t else None
                if nxt != (dist, ordered):
                    break
                self.next()
                clauses.append(_to_span(self.primary()))
            q = Q.SpanNearQuery(tuple(clauses), slop=dist - 1,
                                in_order=ordered)

    def primary(self) -> Q.Query:
        t = self.next()
        if t == "(":
            q = self.or_expr()
            if self.next() != ")":
                raise ValueError("expected ')'")
            return q
        op = _dist_op(t)
        if (op or t.upper() in ("AND", "OR")) and self.peek() == "(":
            self.next()  # '('
            args = [self.or_expr()]
            while self.peek() == ",":
                self.next()
                args.append(self.or_expr())
            if self.next() != ")":
                raise ValueError("expected ')'")
            if op:
                dist, ordered = op
                return Q.SpanNearQuery(tuple(_to_span(a) for a in args),
                                       slop=dist - 1, in_order=ordered)
            if t.upper() == "AND":
                return Q.BooleanQuery(must=tuple(args))
            return Q.BooleanQuery(should=tuple(args),
                                  minimum_should_match=1)
        if t in (")", ","):
            raise ValueError(f"unexpected {t!r}")
        term = t.lower()
        if "*" in term or "?" in term:
            return Q.WildcardQuery(term)  # SrndTruncQuery
        return Q.TermQuery(term)


def parse_surround(s: str) -> Q.Query:
    """Parse a surround query string into the engine's query AST."""
    toks = _tokens(s)
    if not toks:
        return Q.MatchNoDocsQuery()
    p = _Parser(toks)
    q = p.or_expr()
    if p.peek() is not None:
        raise ValueError(f"trailing input at {p.peek()!r}")
    return q

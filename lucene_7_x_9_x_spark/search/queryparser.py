"""Classic query-string parser -> Query AST.

Covers the subset of Lucene's classic QueryParser syntax exercised by the
reference demos (solr-8.4.0/lucene/queryparser/src/java/.../classic/
QueryParserBase.java:44,59-74; QueryBuilder.java:59):

  term                          TermQuery (analyzed, lowercased)
  "a b"                         PhraseQuery, "a b"~2 with slop
  field:term / field:"a b"      field prefix, validated against the parse()
                                caller's field list (pass the searcher's
                                fields for a multi-field index; unknown
                                fields are an error, Lucene-parser style)
  +term / -term                 required / prohibited (MUST / MUST_NOT)
  a AND b / a OR b / NOT a      boolean operators (left-assoc, AND binds via
                                clause folding like Lucene's parser)
  (...)                         grouping
  term* / te?m                  PrefixQuery / WildcardQuery
  /regex/                       RegexpQuery
  term~ / term~1                FuzzyQuery (default maxEdits=2)
  [a TO b] / {a TO b}           TermRangeQuery (inclusive / exclusive)
  term^2.5                      boost
  *:*                           MatchAllDocsQuery

Default operator is OR (QueryParserBase default), i.e. bare terms become
SHOULD clauses. NOT/'-' terms become MUST_NOT. As in Lucene, 'a AND b OR c'
folds left-to-right over one clause list: AND promotes both neighbors to MUST.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from . import query as Q

__all__ = ["parse", "QueryParseError"]


class QueryParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<lparen>\() | (?P<rparen>\)) |
      (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
      (?P<plus>\+) | (?P<minus>-) |
      (?P<phrase>(?:(?P<phfield>[A-Za-z_][A-Za-z0-9_]*):)?
                 "(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?) |
      (?P<regex>/(?P<regex_body>[^/]+)/) |
      (?P<range>(?P<lb>[\[{])\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*(?P<rb>[\]}])) |
      (?P<term>[^\s()^+\-"/][^\s()^]*)
    )(?:\^(?P<boost>\d+(?:\.\d+)?))?""",
    re.VERBOSE,
)

_FUZZY_RE = re.compile(r"^(?P<body>.+?)~(?P<edits>\d)?$")


@dataclass
class _Clause:
    occur: str  # SHOULD | MUST | MUST_NOT
    query: Q.Query


def _analyze_term(text: str, analyzer) -> list[str]:
    return [t for t, _ in analyzer.tokenize(text)]


def _check_field(field: str, cfg: "_ParseConfig") -> str | None:
    """Validate a field prefix; returns the field to attach to the leaf
    (None = the default field, so single-field queries stay field-less)."""
    if cfg.fields is not None and field not in cfg.fields and field != "*":
        raise QueryParseError(
            f"unknown field: {field!r} (index has {sorted(cfg.fields)})")
    if field in ("*", cfg.default_field):
        return None
    return field


def _leaf_from_term(raw: str, analyzer, boost: float,
                    cfg: "_ParseConfig") -> Q.Query:
    if raw == "*:*":
        return Q.MatchAllDocsQuery(boost=boost)
    field = None
    if ":" in raw:
        fld, raw = raw.split(":", 1)
        field = _check_field(fld, cfg)
        if raw == "*":
            return Q.MatchAllDocsQuery(boost=boost)
    m = _FUZZY_RE.match(raw)
    if m and not raw.endswith("\\~"):
        body = m.group("body")
        edits = int(m.group("edits") or 2)
        toks = _analyze_term(body, analyzer)
        if len(toks) != 1:
            raise QueryParseError(f"fuzzy needs a single term: {raw!r}")
        return Q.FuzzyQuery(toks[0], max_edits=edits, boost=boost,
                            field=field)
    if "*" in raw or "?" in raw:
        low = raw.lower()
        if low[0] in "*?" and not cfg.allow_leading_wildcard:
            # QueryParserBase.getWildcardQuery: leading wildcards are
            # rejected unless setAllowLeadingWildcard(true) — the automaton
            # (here: the dictionary rlike) degenerates to a full-dictionary
            # walk, the classic self-DoS guard
            raise QueryParseError(
                "'*' or '?' not allowed as first character in WildcardQuery "
                "(pass allow_leading_wildcard=True to override)")
        if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
            return Q.PrefixQuery(low[:-1], boost=boost, field=field)
        return Q.WildcardQuery(low, boost=boost, field=field)
    toks = _analyze_term(raw, analyzer)
    if not toks:
        return Q.MatchNoDocsQuery()
    if len(toks) == 1:
        return Q.TermQuery(toks[0], boost=boost, field=field)
    # multi-token text without quotes: Lucene's QueryBuilder emits a boolean
    # SHOULD of the analyzed terms (default operator OR)
    return Q.BooleanQuery(
        should=tuple(Q.TermQuery(t, field=field) for t in toks),
        boost=boost)


@dataclass
class _ParseConfig:
    fields: tuple | None   # known field names; None = accept any
    default_field: str
    allow_leading_wildcard: bool = False


def parse(s: str, analyzer=None, fields: tuple | None = ("text", "*"),
          default_field: str = "text",
          allow_leading_wildcard: bool = False) -> Q.Query:
    """Parse a classic query string into the AST (default operator OR).

    ``fields``: acceptable `field:`-prefix names (QueryParser validates
    against the schema); None accepts any. ``default_field`` terms stay
    field-less (single-field compatibility); other fields ride the leaf's
    ``field`` attribute for the searcher to qualify."""
    if analyzer is None:
        from ..analysis.tokenizer import STANDARD
        analyzer = STANDARD
    cfg = _ParseConfig(tuple(fields) if fields is not None else None,
                       default_field, allow_leading_wildcard)
    pos = 0
    out, _, _ = _parse_clauses(s, pos, analyzer, depth=0, cfg=cfg)
    return out


def _parse_clauses(s: str, pos: int, analyzer, depth: int,
                   cfg: "_ParseConfig"):
    clauses: list[_Clause] = []
    pending_occur = None   # from +/-/NOT
    pending_op = None      # from AND/OR
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise QueryParseError(f"cannot parse at: {s[pos:]!r}")
        pos = m.end()
        boost = float(m.group("boost") or 1.0)
        if m.group("rparen"):
            if depth == 0:
                raise QueryParseError("unbalanced ')'")
            return _fold(clauses), pos, boost
        if m.group("lparen"):
            sub, pos, group_boost = _parse_clauses(s, pos, analyzer, depth + 1,
                                                   cfg)
            if group_boost != 1.0:
                sub = Q.BoostQuery(sub, group_boost)
            _push(clauses, sub, pending_occur, pending_op)
            pending_occur = pending_op = None
            continue
        if m.group("and"):
            pending_op = "AND"
            continue
        if m.group("or"):
            pending_op = "OR"
            continue
        if m.group("not"):
            pending_occur = "MUST_NOT"
            continue
        if m.group("plus"):
            pending_occur = "MUST"
            continue
        if m.group("minus"):
            pending_occur = "MUST_NOT"
            continue
        if m.group("phrase") is not None:
            toks = _analyze_term(m.group("phrase_body"), analyzer)
            slop = int(m.group("slop") or 0)
            phf = m.group("phfield")
            field = _check_field(phf, cfg) if phf else None
            if not toks:
                leaf: Q.Query = Q.MatchNoDocsQuery()
            elif len(toks) == 1:
                leaf = Q.TermQuery(toks[0], boost=boost, field=field)
            else:
                leaf = Q.PhraseQuery(tuple(toks), slop=slop, boost=boost,
                                     field=field)
        elif m.group("regex") is not None:
            leaf = Q.RegexpQuery(m.group("regex_body"), boost=boost)
        elif m.group("range") is not None:
            lo = None if m.group("lo") == "*" else m.group("lo").lower()
            hi = None if m.group("hi") == "*" else m.group("hi").lower()
            leaf = Q.TermRangeQuery(
                lo, hi,
                include_lower=m.group("lb") == "[",
                include_upper=m.group("rb") == "]",
                boost=boost)
        else:
            leaf = _leaf_from_term(m.group("term"), analyzer, boost, cfg)
        _push(clauses, leaf, pending_occur, pending_op)
        pending_occur = pending_op = None
    if depth > 0:
        raise QueryParseError("unbalanced '('")
    return _fold(clauses), pos, 1.0


def _push(clauses: list, leaf: Q.Query, occur, op) -> None:
    if occur is None:
        occur = "SHOULD"
    if op == "AND":
        # promote previous non-prohibited clause to MUST, this one too
        if clauses and clauses[-1].occur == "SHOULD":
            clauses[-1] = _Clause("MUST", clauses[-1].query)
        if occur == "SHOULD":
            occur = "MUST"
    clauses.append(_Clause(occur, leaf))


def _fold(clauses: list) -> Q.Query:
    if not clauses:
        return Q.MatchNoDocsQuery()
    if len(clauses) == 1 and clauses[0].occur == "SHOULD":
        return clauses[0].query
    must = tuple(c.query for c in clauses if c.occur == "MUST")
    should = tuple(c.query for c in clauses if c.occur == "SHOULD")
    must_not = tuple(c.query for c in clauses if c.occur == "MUST_NOT")
    return Q.BooleanQuery(must=must, should=should, must_not=must_not)


def complex_phrase_query(searcher, phrase: str, slop: int = 0,
                         field: str | None = None,
                         max_expansions: int = 64) -> Q.Query:
    """ComplexPhraseQueryParser analog (reference: queryparser/src/java/org/
    apache/lucene/queryparser/complexPhrase/ComplexPhraseQueryParser.java —
    phrases whose embedded clauses are wildcards/prefixes, e.g.
    "john smyth*"~2; the reference rewrites each such clause against the
    index and runs the phrase as spans over the expanded alternatives).

    Here each whitespace token of `phrase` becomes a MultiPhraseQuery slot:
    a plain token is a single-term slot, a token containing `*`/`?` expands
    against the term dictionary via the pushed-predicate scan
    (searcher._matching_terms — the expansion never collects more than
    `max_expansions` rows, the TopTermsRewrite bound; the reference's
    rewrite is unbounded, the cap is our documented scale guard). The
    resulting MultiPhraseQuery runs on the vectorized k-stream positional
    walk when no term repeats."""
    import fnmatch

    from ..fields import bare_term

    pfx = searcher._field_prefix(field)
    slots: list[tuple] = []
    for tok in phrase.split():
        tok = tok.lower()
        if "*" in tok or "?" in tok:
            import re as _re
            pat = fnmatch.translate(tok)
            if pfx:
                pat = _re.escape(pfx) + pat
            p = Q.TermPredicateQuery("regex", (pat,))
            terms = searcher._matching_terms(p, max_expansions)
            if not terms:
                return Q.MatchNoDocsQuery()
            slots.append(tuple(sorted(bare_term(t) if pfx else t
                                      for t in terms)))
        else:
            slots.append((tok,))
    if not slots:
        return Q.MatchNoDocsQuery()
    return Q.MultiPhraseQuery(tuple(slots), slop=slop, field=field)

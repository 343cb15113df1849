"""StandardAnalyzer-equivalent text analysis chain as vectorized functions.

Semantics source (behavior only):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:41,92-101
    (StandardTokenizer -> LowerCaseFilter -> StopFilter; maxTokenLength = 255;
     default stop set is EMPTY)
  .../analysis/standard/StandardTokenizer.java:32-90 (UAX#29 word-break token types)
  solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:48-54
    (the canonical 33-word English stop set)
  .../analysis/StopFilter.java:28 (FilteringTokenFilter keeps position increments —
    removed tokens leave position holes)

The tokenizer approximates UAX#29 word break with a frozen regex: alnum runs with
UAX#29 MidLetter/MidNumLet joins (apostrophe, period between alnums), numbers with
decimal separators, CJK ideographs as single-char tokens, kana/hangul runs. Golden
tests in tests/test_tokenizer.py freeze the contract. Divergences from the full
JFlex DFA (exotic emoji/combining sequences) are out of scope for the corpus shapes
this engine targets; the contract is the frozen goldens.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Tuple

import pandas as pd

__all__ = ["ENGLISH_STOP_WORDS", "Analyzer", "STANDARD", "ENGLISH", "CJK",
           "ascii_fold", "tokenize_text"]

# EnglishAnalyzer.java:48-54
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:41

_ALNUM = r"[^\W_]"  # unicode letters + digits, excluding underscore
_TOKEN_RE = re.compile(
    # CJK ideographs tokenize as single characters (StandardTokenizer IDEOGRAPHIC)
    r"(?P<ideo>[一-鿿㐀-䶿豈-﫿])"
    # kana / hangul runs
    r"|(?P<kana>[぀-ヿ]+|[가-힯]+)"
    # alnum runs joined by UAX#29 MidNumLet-style separators (' . ’ between alnums)
    rf"|(?P<word>{_ALNUM}+(?:['’.]{_ALNUM}+)*)",
    re.UNICODE,
)
# ASCII fast path: on pure-ASCII text the general pattern reduces to alnum
# runs with '/. joins, and LowerCaseFilter commutes with tokenization (ASCII
# case-folding never changes character classes), so the whole text can be
# lowered in ONE C-level pass and tokens extracted with findall (a single
# C-level scan, no per-match Match objects) -- the build's hot-loop lever.
_ASCII_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:['.][A-Za-z0-9]+)*")


def _raw_tokens(text: str) -> Iterable[str]:
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if len(tok) <= MAX_TOKEN_LENGTH:
            yield tok
        else:
            # StandardTokenizer splits over-long tokens at maxTokenLength
            for i in range(0, len(tok), MAX_TOKEN_LENGTH):
                yield tok[i : i + MAX_TOKEN_LENGTH]


# single ideograph token (the StandardTokenizer IDEOGRAPHIC type our regex
# emits one char at a time)
_IDEO_ONE = re.compile(r"[一-鿿㐀-䶿豈-﫿]")


def _cjk_fold(tokens: List[str]) -> List[str]:
    """CJKBigramFilter analog (analysis/common/src/java/org/apache/lucene/
    analysis/cjk/CJKBigramFilter.java, default flags: HAN bigrams, no
    unigram output): every run of >=2 consecutive ideograph unigrams in the
    token stream becomes its n-1 overlapping bigrams; an ISOLATED ideograph
    (run of 1) stays a unigram ("HANGUL/HAN characters with no adjacent
    partner are output in unigram form"); non-ideograph tokens pass through
    and break runs."""
    out: List[str] = []
    run: List[str] = []

    def flush():
        if len(run) == 1:
            out.append(run[0])
        elif run:
            out.extend(run[i] + run[i + 1] for i in range(len(run) - 1))
        run.clear()

    for tok in tokens:
        if len(tok) == 1 and _IDEO_ONE.match(tok):
            run.append(tok)
            continue
        flush()
        out.append(tok)
    flush()
    return out


def _cjk_dict_fold(tokens: List[str], lexicon: frozenset,
                   max_len: int) -> List[str]:
    """Dictionary-based CJK segmentation (the reference ships whole lexicon
    modules — solr-8.4.0/lucene/analysis/smartcn (zh), kuromoji (ja),
    nori (ko); behavior role only). The algorithm here is greedy forward
    maximum matching over a frozen wordlist — the classic FMM baseline that
    smartcn's HMM refines: each run of consecutive ideograph unigrams emits
    the LONGEST lexicon word starting at the cursor, falling back to the
    single character for out-of-vocabulary spans (smartcn's OOV behavior).
    Non-ideograph tokens pass through and break runs."""
    out: List[str] = []
    run: List[str] = []

    def flush():
        i, n = 0, len(run)
        while i < n:
            emitted = False
            for ln in range(min(max_len, n - i), 1, -1):
                w = "".join(run[i:i + ln])
                if w in lexicon:
                    out.append(w)
                    i += ln
                    emitted = True
                    break
            if not emitted:
                out.append(run[i])
                i += 1
        run.clear()

    for tok in tokens:
        if len(tok) == 1 and _IDEO_ONE.match(tok):
            run.append(tok)
            continue
        flush()
        out.append(tok)
    flush()
    return out


# ASCIIFoldingFilter analog: NFKD-decompose + drop combining marks covers the
# accent table; the explicit map covers the Latin-1/Extended-A letters that
# have NO canonical decomposition but a documented fold in
# ASCIIFoldingFilter.java (ss/ae/oe ligature expansions, slashed/stroked
# letters, eth/thorn)
_ASCII_FOLD_MAP = {
    "ß": "ss", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H",
    "ł": "l", "Ł": "L", "þ": "th", "Þ": "TH", "ð": "d", "Ð": "D",
    "ı": "i", "ĳ": "ij", "Ĳ": "IJ", "ŋ": "n", "Ŋ": "N", "ſ": "s",
}
_ASCII_FOLD_TRANS = str.maketrans(_ASCII_FOLD_MAP)


def ascii_fold(tok: str) -> str:
    """ASCIIFoldingFilter analog (analysis/common/.../miscellaneous/
    ASCIIFoldingFilter.java): map Unicode Latin variants to their ASCII
    equivalents — é->e, ü->u, ß->ss, ø->o, ..."""
    if tok.isascii():
        return tok
    import unicodedata
    t = tok.translate(_ASCII_FOLD_TRANS)
    t = unicodedata.normalize("NFKD", t)
    t = "".join(c for c in t if not unicodedata.combining(c))
    return t


SHINGLE_FILLER = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN


def _shingle_fold(pairs: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
    """ShingleFilter analog (analysis/common/.../shingle/ShingleFilter.java,
    defaults min=max=2, outputUnigrams=true, tokenSeparator ' '): emit each
    unigram plus the bigram of every adjacent token pair, where stop-filter
    position holes are occupied by the filler token '_'. A bigram anchors at
    its first component's position (posIncrement 0 relative to the unigram —
    overlap tokens, discounted from the norm). All-filler shingles are
    dropped; a shingle STARTING at a hole anchors the filler's position."""
    if not pairs:
        return pairs
    out: List[Tuple[str, int]] = []
    for i, (term, pos) in enumerate(pairs):
        out.append((term, pos))
        if i + 1 < len(pairs):
            nterm, npos = pairs[i + 1]
            if npos - pos == 1:
                out.append((term + " " + nterm, pos))
            else:
                # holes: term _ ... _ next -> 'term _' and '_ next' (interior
                # all-filler bigrams are dropped, ShingleFilter emits none)
                out.append((term + " " + SHINGLE_FILLER, pos))
                out.append((SHINGLE_FILLER + " " + nterm, npos - 1))
    return out


def _synonym_expand(pairs: List[Tuple[str, int]],
                    mapping: dict) -> List[Tuple[str, int]]:
    """SynonymFilter/SynonymGraphFilter analog (analysis/common/.../synonym/
    SynonymGraphFilter.java, single-token rules, keepOrig=true): each mapped
    token additionally emits its synonyms AT THE SAME POSITION (posIncrement
    0 — overlap tokens, discounted from the norm), so a query for either
    form matches and phrase positions stay aligned. Multi-token rules and
    graph side-paths are out of scope (documented; the reference's
    SynonymQuery covers the query-time direction, entry synonym_topk)."""
    out: List[Tuple[str, int]] = []
    for term, pos in pairs:
        out.append((term, pos))
        for syn in mapping.get(term, ()):
            out.append((syn, pos))
    return out


def _remove_dups(pairs: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
    """RemoveDuplicatesTokenFilter analog (analysis/common/.../miscellaneous/
    RemoveDuplicatesTokenFilter.java; demos TestRemoveDuplicatesTokenFilter,
    RemoveDuplicatesTokenFilterFactory): drop a token when the stream already
    emitted the SAME term at the SAME position — the stacked-injector (synonym
    rules re-emitting the original, phonetic code colliding with a synonym)
    cleanup. Tokens at different positions are never collapsed."""
    seen = set()
    out: List[Tuple[str, int]] = []
    for tp in pairs:
        if tp in seen:
            continue
        seen.add(tp)
        out.append(tp)
    return out


# American Soundex letter codes (the commons-codec US_ENGLISH table that
# Lucene's analysis/phonetic/PhoneticFilter.java delegates to): vowels + Y
# code '' (they separate duplicate codes), H/W are skipped WITHOUT separating
# (the Ashcraft rule), consonant groups code 1-6.
_SOUNDEX_CODES = {}
for _letters, _digit in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                         ("L", "4"), ("MN", "5"), ("R", "6")):
    for _c in _letters:
        _SOUNDEX_CODES[_c] = _digit


def soundex(word: str) -> str:
    """American Soundex (commons-codec Soundex.US_ENGLISH behavior): first
    letter + 3 digits, adjacent duplicate codes collapsed, H/W transparent
    to collapsing, vowels/Y reset it. Classic vectors: Robert/Rupert -> R163,
    Ashcraft -> A261, Tymczak -> T522, Pfister -> P236, Honeyman -> H555.
    Tokens without an ASCII letter come back unchanged."""
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return word
    out = [letters[0]]
    last = _SOUNDEX_CODES.get(letters[0], "")
    for c in letters[1:]:
        if c in ("H", "W"):
            continue  # transparent: previous code still guards collapsing
        code = _SOUNDEX_CODES.get(c, "")
        if code and code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code
    return "".join(out).ljust(4, "0")


def _phonetic_expand(pairs: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
    """PhoneticFilter analog (analysis/phonetic/PhoneticFilter.java,
    inject=true, Soundex encoder): each token additionally emits its phonetic
    code AT THE SAME POSITION (posIncrement 0 — an overlap token discounted
    from the norm), so exact and sounds-like queries both match and phrase
    positions stay aligned. Codes are lowercased into the term dictionary."""
    out: List[Tuple[str, int]] = []
    for term, pos in pairs:
        out.append((term, pos))
        code = soundex(term).lower()
        if code != term:
            out.append((code, pos))
    return out


def _edge_expand(pairs: List[Tuple[str, int]], lo: int,
                 hi: int) -> List[Tuple[str, int]]:
    """EdgeNGramTokenFilter analog (analysis/common/.../ngram/
    EdgeNGramTokenFilter.java, preserveOriginal=true): each token emits its
    leading grams of length lo..min(hi, len) at the TOKEN's position
    (overlap tokens, discounted from the norm); a token outside [lo, hi]
    additionally/only keeps its original form — the autocomplete-index
    configuration."""
    out: List[Tuple[str, int]] = []
    for term, pos in pairs:
        n = len(term)
        if n < lo:
            out.append((term, pos))  # preserveOriginal below minGram
            continue
        for g in range(lo, min(hi, n) + 1):
            out.append((term[:g], pos))
        if n > hi:
            out.append((term, pos))  # preserveOriginal above maxGram
    return out


class Analyzer:
    """tokenize(text) -> [(term, position)] with stop-filter position holes.

    stem/strip_possessive compose the EnglishAnalyzer chain
    (EnglishAnalyzer.java:110-123: possessive -> lowercase -> stop ->
    PorterStem; we lowercase first, which commutes with stripping 's)."""

    def __init__(self, stopwords: Optional[frozenset] = None,
                 lowercase: bool = True, stem: bool = False,
                 strip_possessive: bool = False, cjk_bigrams: bool = False,
                 ascii_folding: bool = False, shingles: bool = False,
                 edge_ngrams: Optional[Tuple[int, int]] = None,
                 synonyms: Optional[dict] = None,
                 cjk_dict: Optional[frozenset] = None,
                 phonetic: Optional[str] = None,
                 remove_duplicates: bool = False):
        if phonetic is not None and phonetic != "soundex":
            raise ValueError(f"unknown phonetic encoder: {phonetic!r} "
                             "(supported: 'soundex')")
        if cjk_dict and cjk_bigrams:
            raise ValueError("cjk_dict and cjk_bigrams are alternative "
                             "segmentation routes; pick one")
        if shingles and edge_ngrams:
            raise ValueError("shingles and edge_ngrams cannot combine "
                             "(undefined gram-of-shingle semantics)")
        if synonyms and (shingles or edge_ngrams):
            raise ValueError("synonyms cannot combine with shingles/"
                             "edge_ngrams (graph-shingle semantics are out "
                             "of scope)")
        # StandardAnalyzer() default: NO stopwords (StandardAnalyzer.java:57-58)
        self.stopwords = frozenset(stopwords) if stopwords else frozenset()
        self.lowercase = lowercase
        self.stem = stem
        self.strip_possessive = strip_possessive
        self.cjk_bigrams = cjk_bigrams
        self.ascii_folding = ascii_folding
        self.shingles = shingles
        self.edge_ngrams = tuple(edge_ngrams) if edge_ngrams else None
        self.synonyms = ({k: tuple(v) for k, v in synonyms.items()}
                         if synonyms else None)
        self.cjk_dict = frozenset(cjk_dict) if cjk_dict else None
        self._cjk_dict_maxlen = (max(len(w) for w in self.cjk_dict)
                                 if self.cjk_dict else 0)
        self.phonetic = phonetic
        self.remove_duplicates = remove_duplicates

    def _strip_poss(self, tok: str) -> str:
        # EnglishPossessiveFilter.java:53-58: drop a trailing 's / ’s
        if len(tok) >= 2 and tok[-1] in "sS" and tok[-2] in "'’＇":
            return tok[:-2]
        return tok

    def _stem(self, tok: str) -> str:
        from .porter import porter_stem
        return porter_stem(tok)

    def _base_pairs(self, text: str) -> List[Tuple[str, int]]:
        raw: Iterable[str] = _raw_tokens(text)
        if self.cjk_dict:
            raw = _cjk_dict_fold(list(raw), self.cjk_dict,
                                 self._cjk_dict_maxlen)
        elif self.cjk_bigrams:
            raw = _cjk_fold(list(raw))
        out = []
        pos = 0
        for tok in raw:
            if self.lowercase:
                tok = tok.lower()
            if self.ascii_folding:
                tok = ascii_fold(tok)
            if self.strip_possessive:
                tok = self._strip_poss(tok)
            if tok in self.stopwords:
                pos += 1  # position hole (StopFilter keeps increments)
                continue
            if self.stem:
                tok = self._stem(tok)
            out.append((tok, pos))
            pos += 1
        return out

    def tokenize(self, text: Optional[str]) -> List[Tuple[str, int]]:
        if not text:
            return []
        out = self._base_pairs(text)
        if self.synonyms:
            out = _synonym_expand(out, self.synonyms)
        if self.phonetic:
            out = _phonetic_expand(out)
        if self.shingles:
            out = _shingle_fold(out)
        if self.edge_ngrams:
            out = _edge_expand(out, *self.edge_ngrams)
        if self.remove_duplicates:
            out = _remove_dups(out)
        return out

    def term_freqs(self, text: Optional[str]):
        """One-pass tokenize + per-term position aggregation.

        Returns ([(term, freq, positions)], doclen). Same contract as looping
        tokenize() into a dict, without materializing the token list — this is
        the index build's hot loop (~every token of the corpus passes here)."""
        if not text:
            return [], 0
        if (self.stem or self.strip_possessive or self.cjk_bigrams
                or self.cjk_dict or self.phonetic
                or self.shingles or self.edge_ngrams or self.synonyms
                or self.remove_duplicates
                or (self.ascii_folding and not text.isascii())):
            # filter-chain path: per-token transforms, Zipfian-memoized
            # stemming (porter.py) keeps this near the plain-loop cost.
            # (ascii_folding on pure-ASCII text is the identity, so those
            # docs keep the fast path below.)
            acc = {}
            base = self._base_pairs(text)
            # norm counts only non-overlap tokens (discountOverlaps=true,
            # BM25Similarity default): shingles ride posIncrement 0
            total = len(base)
            pairs = (_synonym_expand(base, self.synonyms)
                     if self.synonyms else base)
            if self.phonetic:
                pairs = _phonetic_expand(pairs)
            if self.shingles:
                pairs = _shingle_fold(pairs)
            if self.edge_ngrams:
                pairs = _edge_expand(pairs, *self.edge_ngrams)
            if self.remove_duplicates:
                pairs = _remove_dups(pairs)
            for tok, p in pairs:
                lst = acc.get(tok)
                if lst is None:
                    acc[tok] = [p]
                else:
                    lst.append(p)
            return [(t, len(ps), ps) for t, ps in acc.items()], total
        acc: dict = {}
        pos = 0
        stop = self.stopwords
        lower = self.lowercase
        if text.isascii():
            # fast path: one C-level lower + one C-level findall (see
            # _ASCII_TOKEN_RE note); token stream is provably identical
            toks = _ASCII_TOKEN_RE.findall(
                text.lower() if lower else text)
            if not stop:
                for tok in toks:
                    if len(tok) > MAX_TOKEN_LENGTH:
                        for i in range(0, len(tok), MAX_TOKEN_LENGTH):
                            sub = tok[i: i + MAX_TOKEN_LENGTH]
                            lst = acc.get(sub)
                            if lst is None:
                                acc[sub] = [pos]
                            else:
                                lst.append(pos)
                            pos += 1
                        continue
                    lst = acc.get(tok)
                    if lst is None:
                        acc[tok] = [pos]
                    else:
                        lst.append(pos)
                    pos += 1
                return [(t, len(ps), ps) for t, ps in acc.items()], pos
            token_iter = iter(toks)
        else:
            token_iter = (m.group(0) for m in _TOKEN_RE.finditer(text))
        for tok in token_iter:
            if len(tok) > MAX_TOKEN_LENGTH:
                for i in range(0, len(tok), MAX_TOKEN_LENGTH):
                    sub = tok[i: i + MAX_TOKEN_LENGTH]
                    if lower:
                        sub = sub.lower()
                    if sub in stop:
                        pos += 1
                        continue
                    lst = acc.get(sub)
                    if lst is None:
                        acc[sub] = [pos]
                    else:
                        lst.append(pos)
                    pos += 1
                continue
            if lower:
                tok = tok.lower()
            if tok in stop:
                pos += 1
                continue
            lst = acc.get(tok)
            if lst is None:
                acc[tok] = [pos]
            else:
                lst.append(pos)
            pos += 1
        # doclen = number of NON-stop tokens (norm counts emitted tokens only)
        total = 0
        for ps in acc.values():
            total += len(ps)
        return [(t, len(ps), ps) for t, ps in acc.items()], total

    def term_freqs_offsets(self, text: Optional[str]):
        """term_freqs plus the per-position character offsets of each token
        in the ORIGINAL text — the OffsetAttribute that lands in the postings'
        offsets channel when the field is indexed with
        IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS (demo
        StartsTest.java; offsets ride the .pay file,
        Lucene84PostingsFormat.java:99-103).

        Returns ([(term, freq, positions, starts, lens)], doclen) with
        starts/lens aligned 1:1 with positions (end offset = start + len).
        Only the non-injecting chain (lowercase + stopwords) supports
        offsets: token-graph filters (stemming, shingles, synonyms, CJK
        re-segmentation, phonetic/edge-n-gram injection) change or multiply
        terms per source span, exactly the configurations Lucene's
        highlighters refuse offsets for. Terms and positions are identical
        to term_freqs() on the same text (pinned by tests)."""
        if not text:
            return [], 0
        if (self.stem or self.strip_possessive or self.cjk_bigrams
                or self.cjk_dict or self.phonetic or self.shingles
                or self.edge_ngrams or self.synonyms
                or self.remove_duplicates or self.ascii_folding):
            raise ValueError(
                "offsets require a non-injecting analyzer chain "
                "(lowercase + stopwords only)")
        acc: dict = {}
        pos = 0
        stop = self.stopwords
        lower = self.lowercase
        for m in _TOKEN_RE.finditer(text):
            tok = m.group(0)
            s0 = m.start()
            if len(tok) > MAX_TOKEN_LENGTH:
                # StandardTokenizer splits over-long tokens at maxTokenLength;
                # each split keeps its own source span
                for i in range(0, len(tok), MAX_TOKEN_LENGTH):
                    sub = tok[i: i + MAX_TOKEN_LENGTH]
                    sub_len = len(sub)  # source-span length, pre-casefold
                    if lower:
                        sub = sub.lower()
                    if sub in stop:
                        pos += 1
                        continue
                    acc.setdefault(sub, []).append((pos, s0 + i, sub_len))
                    pos += 1
                continue
            ln = len(tok)
            if lower:
                tok = tok.lower()
            if tok in stop:
                pos += 1
                continue
            acc.setdefault(tok, []).append((pos, s0, ln))
            pos += 1
        total = sum(len(v) for v in acc.values())
        return ([(t, len(v), [p for p, _, _ in v], [s for _, s, _ in v],
                  [ln for _, _, ln in v]) for t, v in acc.items()], total)

    def term_freqs_series(self, texts: pd.Series) -> pd.Series:
        """Per-doc aggregated [(term, freq, positions)] — the shape the index
        builder explodes (avoids a per-token shuffle row; SURVEY §3.1 retrace)."""

        def agg(text):
            acc: dict = {}
            for term, pos in self.tokenize(text):
                acc.setdefault(term, []).append(pos)
            return [(t, len(ps), ps) for t, ps in acc.items()]

        return texts.map(agg)


class PayloadAnalyzer(Analyzer):
    """Whitespace tokenizer + delimited-payload filter (the demo
    LuceneDemo/src/main/java/lucene/AnalyzerTest/PayloadAnalyzer.java role,
    via DelimitedPayloadTokenFilter semantics): a token ``term|42`` emits
    ``term`` with integer payload 42 attached to its position; a token
    without the delimiter gets payload 0. The payloads land in the postings'
    .pay channel (pay_bytes) and feed PayloadScoreQuery-style scoring.

    Whitespace tokenization (not the standard token regex) because the
    delimiter must survive into the filter — exactly why Lucene pairs the
    delimited filter with WhitespaceTokenizer."""

    def __init__(self, delimiter: str = "|", lowercase: bool = True):
        super().__init__(lowercase=lowercase)
        self.delimiter = delimiter

    def term_freqs_payloads(self, text: Optional[str]):
        """([(term, freq, positions, payloads)], doclen) — positions and
        payloads are aligned 1:1."""
        if not text:
            return [], 0
        acc: dict = {}
        pos = 0
        delim = self.delimiter
        for raw in text.split():
            term, _, pay = raw.partition(delim)
            if not term:
                continue
            if self.lowercase:
                term = term.lower()
            try:
                payload = int(pay) if pay else 0
            except ValueError:
                payload = 0
            lst = acc.get(term)
            if lst is None:
                acc[term] = [(pos, payload)]
            else:
                lst.append((pos, payload))
            pos += 1
        return ([(t, len(pp), [p for p, _ in pp], [w for _, w in pp])
                 for t, pp in acc.items()], pos)

    def term_freqs(self, text: Optional[str]):
        """Payload-less view (same terms/positions) so shared read paths
        (MemoryIndex, query analysis) keep working on payload fields."""
        items, doclen = self.term_freqs_payloads(text)
        return [(t, f, ps) for t, f, ps, _ in items], doclen


STANDARD = Analyzer()  # StandardAnalyzer() defaults: lowercase, no stopwords

# EnglishAnalyzer analog (EnglishAnalyzer.java:48-54,110-123): the canonical
# 33-word stop set + possessive strip + Porter stemming
ENGLISH = Analyzer(stopwords=ENGLISH_STOP_WORDS, lowercase=True, stem=True,
                   strip_possessive=True)

# CJKAnalyzer analog (analysis/common/.../cjk/CJKAnalyzer.java):
# StandardTokenizer -> LowerCaseFilter -> CJKBigramFilter; the default
# CJK stop set is omitted (StandardAnalyzer-style empty set — documented
# simplification; stopwords only affect latin tokens riding along)
CJK = Analyzer(cjk_bigrams=True)


def tokenize_text(text: str, analyzer: Analyzer = STANDARD) -> List[str]:
    return [t for t, _ in analyzer.tokenize(text)]

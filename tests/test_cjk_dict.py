"""Dictionary-based CJK segmentation (analysis/smartcn role, round 5).

Reference behavior: the reference ships whole lexicon-segmentation modules —
solr-8.4.0/lucene/analysis/smartcn (zh, HMM over a bundled dictionary),
kuromoji (ja), nori (ko).  The analog here is greedy forward maximum matching
(FMM) over a frozen wordlist — the classic baseline those modules refine —
with smartcn's out-of-vocabulary behavior (unmatched spans fall back to
single-character tokens) and pass-through for non-ideograph tokens.
"""

import pytest

from lucene_7_x_9_x_spark.analysis.tokenizer import Analyzer

A = chr(0x4E00)
B = chr(0x4E01)
C = chr(0x4E02)
D = chr(0x4E03)


def toks(an, text):
    return [t for t, _ in an.tokenize(text)]


def mk(*words):
    return Analyzer(cjk_dict=frozenset(words))


def test_greedy_longest_match_wins():
    # both AB and ABC in the lexicon: FMM emits the longest word at the cursor
    an = mk(A + B, A + B + C)
    assert toks(an, A + B + C + D) == [A + B + C, D]


def test_pair_match():
    an = mk(A + B)
    assert toks(an, A + B + D) == [A + B, D]


def test_oov_falls_back_to_single_chars():
    an = mk(A + B)
    assert toks(an, D + C + D) == [D, C, D]


def test_consecutive_words():
    an = mk(A + B, C + D)
    assert toks(an, A + B + C + D) == [A + B, C + D]


def test_latin_token_breaks_the_run():
    # a non-ideograph token interrupts the ideograph run: no word may span it
    an = mk(A + B)
    assert toks(an, A + " spark " + B) == [A, "spark", B]
    assert toks(an, "hello " + A + B + " world") == ["hello", A + B, "world"]


def test_whitespace_between_ideographs_continues_run():
    # same stream semantics as the bigram filter: whitespace emits no token,
    # the ideograph run continues across it
    an = mk(A + B)
    assert toks(an, A + " " + B) == [A + B]


def test_positions_are_sequential():
    an = mk(A + B)
    assert an.tokenize(A + B + D) == [(A + B, 0), (D, 1)]


def test_dict_and_bigrams_are_exclusive():
    with pytest.raises(ValueError):
        Analyzer(cjk_dict=frozenset([A + B]), cjk_bigrams=True)


# ---- closed-form equivalence over the synthetic contract corpus -------------
# _ZH_LEX (step-7 pairs for all x, step-7 triples for even x) makes greedy FMM
# over the generated han text have a closed form: the parity of x at the
# cursor flips every character, so an even-doc_id text (x0 even) opens with
# one triple and continues with pairs; an odd one is pairs throughout; the
# trailing character, when left over, is out-of-vocabulary and emits as a
# singleton.  The DuckDB oracle for cjk_dict_topk regenerates exactly this.

def _han(d):
    return "".join(chr(0x4E00 + (d * 31 + i * 7) % 256)
                   for i in range(d % 12 + 2))


def _closed_form(d):
    h = _han(d)
    L = len(h)
    out = []
    c = 0
    if d % 2 == 0 and L >= 3:
        out.append(h[0:3])
        c = 3
    while L - c >= 2:
        out.append(h[c:c + 2])
        c += 2
    if c < L:
        out.append(h[c])
    return out


def test_fmm_matches_closed_form_over_contract_corpus():
    from __spark_entry__ import _ZH_LEX
    an = Analyzer(cjk_dict=_ZH_LEX)
    for d in range(600):
        assert toks(an, _han(d)) == _closed_form(d), f"doc_id={d}"


def test_contract_terms_are_lexicon_words():
    from __spark_entry__ import _ZH_LEX, CJK_DICT_PAIR, CJK_DICT_TRI
    assert CJK_DICT_PAIR in _ZH_LEX and len(CJK_DICT_PAIR) == 2
    assert CJK_DICT_TRI in _ZH_LEX and len(CJK_DICT_TRI) == 3

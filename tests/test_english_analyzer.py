"""EnglishAnalyzer analog: Porter stemmer goldens + the filter chain.

Stemmer vectors are from Martin Porter's published examples (the 1980 paper
and the reference implementation's sample vocabulary) — independent of the
implementation. Chain semantics: possessive strip -> lowercase -> stop holes
-> stem (EnglishAnalyzer.java:110-123)."""

import pytest

from lucene_7_x_9_x_spark.analysis.porter import porter_stem
from lucene_7_x_9_x_spark.analysis.tokenizer import ENGLISH, Analyzer

VECTORS = {
    # step1 plurals / ed / ing
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "filing": "file",
    # step2 y->i
    "happy": "happi", "sky": "sky",
    # step3 double suffices
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "formaliti": "formal", "sensibiliti": "sensibl",
    # step4
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step5
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "effective": "effect",
    # step6
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # length <= 2 untouched (reference departure)
    "is": "is", "be": "be", "s": "s",
}


def test_porter_goldens():
    for w, want in VECTORS.items():
        assert porter_stem(w) == want, w


def test_english_chain_possessive_stop_stem():
    toks = ENGLISH.tokenize("The Engineer's tables are merging")
    # 'the'/'are' stopped (position holes), possessive stripped, stemmed
    assert toks == [("engin", 1), ("tabl", 2), ("merg", 4)]


def test_term_freqs_matches_tokenize():
    texts = ["The Engineer's tables are merging quickly",
             "a query's sorting and sorted queries"]
    for t in texts:
        items, doclen = ENGLISH.term_freqs(t)
        ref = {}
        for term, pos in ENGLISH.tokenize(t):
            ref.setdefault(term, []).append(pos)
        assert {k: v for k, _, v in [(a, b, c) for a, b, c in items]} == ref
        assert doclen == sum(len(v) for v in ref.values())


def test_standard_unaffected():
    a = Analyzer()
    assert a.tokenize("The tables") == [("the", 0), ("tables", 1)]

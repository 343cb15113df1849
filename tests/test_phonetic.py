"""PhoneticFilter analog (analysis/phonetic/PhoneticFilter.java, inject=true,
commons-codec American Soundex). Pure-python: encoder vectors + analyzer
injection/norm semantics; the index/search path is pinned by the
`phonetic_topk` contract entry against DuckDB."""

import pytest

from lucene_7_x_9_x_spark.analysis.tokenizer import Analyzer, soundex


# The classic published Soundex vectors (US National Archives examples that
# commons-codec's SoundexTest also pins), including the H/W transparency rule
# (Ashcraft) and vowel separation (Tymczak, Honeyman).
@pytest.mark.parametrize("word,code", [
    ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
    ("Ashcroft", "A261"), ("Tymczak", "T522"), ("Pfister", "P236"),
    ("Honeyman", "H555"), ("Washington", "W252"), ("Lee", "L000"),
    ("Gutierrez", "G362"), ("Jackson", "J250"),
])
def test_soundex_classic_vectors(word, code):
    assert soundex(word) == code


def test_soundex_case_and_padding():
    assert soundex("table") == soundex("TABLE") == "T140"
    assert soundex("a") == "A000"


def test_soundex_non_alpha_passthrough():
    assert soundex("宿") == "宿"  # no ASCII letter: token unchanged
    assert soundex("42") == "42"


def test_misspelling_collides_with_intended_word():
    assert soundex("tabel") == soundex("table")
    assert soundex("merj") == soundex("merge")


def test_inject_emits_code_at_same_position():
    an = Analyzer(phonetic="soundex")
    toks = an.tokenize("fast table")
    assert ("fast", 0) in toks and ("f230", 0) in toks
    assert ("table", 1) in toks and ("t140", 1) in toks


def test_injected_tokens_do_not_inflate_doclen():
    an = Analyzer(phonetic="soundex")
    tf, doclen = an.term_freqs("fast table fast")
    assert doclen == 3  # discountOverlaps: codes ride posIncrement 0
    by_term = {t: (f, ps) for t, f, ps in tf}
    assert by_term["fast"] == (2, [0, 2])
    assert by_term["f230"] == (2, [0, 2])
    assert by_term["t140"] == (1, [1])


def test_unknown_encoder_rejected():
    with pytest.raises(ValueError):
        Analyzer(phonetic="metaphone")

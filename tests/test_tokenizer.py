"""Golden token-stream tests — the frozen contract of the analysis chain
(StandardAnalyzer.java:41,92-101 semantics; FIXTURES.md §4)."""

from lucene_7_x_9_x_spark.analysis.tokenizer import (
    Analyzer, ENGLISH_STOP_WORDS, STANDARD, MAX_TOKEN_LENGTH)


GOLDENS = [
    ("Hello, World!", [("hello", 0), ("world", 1)]),
    ("The quick brown fox", [("the", 0), ("quick", 1), ("brown", 2), ("fox", 3)]),
    ("", []),
    (None, []),
    ("  multiple   spaces\tand\nnewlines ",
     [("multiple", 0), ("spaces", 1), ("and", 2), ("newlines", 3)]),
    ("MiXeD CaSe", [("mixed", 0), ("case", 1)]),
    ("digits 42 and 3.14", [("digits", 0), ("42", 1), ("and", 2), ("3.14", 3)]),
    ("john.doe@example.com",
     [("john.doe", 0), ("example.com", 1)]),
    ("can't stop won't stop",
     [("can't", 0), ("stop", 1), ("won't", 2), ("stop", 3)]),
    ("中文分词", [("中", 0), ("文", 1), ("分", 2), ("词", 3)]),
    ("ひらがな and カタカナ",
     [("ひらがな", 0), ("and", 1), ("カタカナ", 2)]),
    ("한글테스트 ok", [("한글테스트", 0), ("ok", 1)]),
    ("under_score splits", [("under", 0), ("score", 1), ("splits", 2)]),
    ("trailing. dots.", [("trailing", 0), ("dots", 1)]),
]


def test_goldens_standard():
    for text, want in GOLDENS:
        assert STANDARD.tokenize(text) == want, text


def test_stop_set_is_33_words():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS


def test_stopwords_leave_position_holes():
    a = Analyzer(stopwords=ENGLISH_STOP_WORDS)
    # "the quick brown fox" -> quick@1 brown@2 fox@3 (hole at 0)
    assert a.tokenize("the quick brown fox") == [
        ("quick", 1), ("brown", 2), ("fox", 3)]


def test_overlong_token_split():
    tok = "q" * (MAX_TOKEN_LENGTH * 2 + 10)
    got = STANDARD.tokenize(tok + " tail")
    assert [t for t, _ in got] == ["q" * 255, "q" * 255, "q" * 10, "tail"]
    assert [p for _, p in got] == [0, 1, 2, 3]


def test_default_analyzer_keeps_stopwords():
    # StandardAnalyzer() default stop set is empty (StandardAnalyzer.java:57-58)
    assert ("the", 0) in STANDARD.tokenize("the end")


def test_term_freqs_series():
    import pandas as pd
    out = STANDARD.term_freqs_series(pd.Series(["a b a c a"]))[0]
    d = {t: (f, ps) for t, f, ps in out}
    assert d["a"] == (3, [0, 2, 4])
    assert d["b"] == (1, [1])

"""ASCIIFoldingFilter + ShingleFilter analogs; infix suggester; function score."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.analysis.tokenizer import (Analyzer,
                                                     ascii_fold,
                                                     tokenize_text)


def test_ascii_fold_accents_and_specials():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("über") == "uber"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("straße") == "strasse"   # ss expansion
    assert ascii_fold("œuvre") == "oeuvre"     # oe ligature
    assert ascii_fold("møller") == "moller"    # slashed o (no decomposition)
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("plain") == "plain"      # ascii passthrough


def test_folding_analyzer_tokens():
    a = Analyzer(ascii_folding=True)
    assert tokenize_text("Café MÜNCHEN søk", a) == ["cafe", "munchen", "sok"]


def test_folding_term_freqs_matches_tokenize():
    a = Analyzer(ascii_folding=True)
    items, dl = a.term_freqs("café café über")
    assert dl == 3
    assert sorted((t, f) for t, f, _ in items) == [("cafe", 2), ("uber", 1)]
    # pure-ASCII text keeps the fast path and folds to itself
    items2, dl2 = a.term_freqs("cafe cafe uber")
    assert sorted((t, f) for t, f, _ in items2) == [("cafe", 2), ("uber", 1)]
    assert dl2 == 3


def test_shingles_basic():
    a = Analyzer(shingles=True)
    assert a.tokenize("please divide this") == [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide this", 1),
        ("this", 2),
    ]


def test_shingles_stop_holes_use_filler():
    # ShingleFilter fills stop-filter holes with '_' (DEFAULT_FILLER_TOKEN)
    a = Analyzer(stopwords=frozenset({"the"}), shingles=True)
    got = a.tokenize("divide the kingdom")
    assert ("divide _", 0) in got
    assert ("_ kingdom", 1) in got
    assert ("divide kingdom", 0) not in got


def test_shingles_doclen_discounts_overlaps():
    a = Analyzer(shingles=True)
    items, dl = a.term_freqs("a b c")
    assert dl == 3  # norms count unigrams only (discountOverlaps)
    terms = {t for t, _, _ in items}
    assert terms == {"a", "b", "c", "a b", "b c"}
    # shingle anchors at its first token's position
    by = {t: ps for t, _, ps in items}
    assert by["a b"] == [0] and by["b c"] == [1]


def test_infix_completions(spark):
    from lucene_7_x_9_x_spark.operators.suggest import infix_completions
    sug = spark.createDataFrame(
        [("big data table", 10), ("tablet pc", 9), ("round table", 8),
         ("no match here", 99)],
        "suggestion string, weight long")
    got = [r["suggestion"]
           for r in infix_completions(sug, "tab", k=5).collect()]
    # weight desc: 'big data table'(10), 'tablet pc'(9), 'round table'(8)
    assert got == ["big data table", "tablet pc", "round table"]
    # infix means token PREFIX: 'atab' must not match
    sug2 = spark.createDataFrame([("xatab y", 5)],
                                 "suggestion string, weight long")
    assert infix_completions(sug2, "tab", k=5).count() == 0


def test_function_score(spark):
    from lucene_7_x_9_x_spark.operators.function_score import function_score
    scores = spark.createDataFrame([(1, 2.0), (2, 3.0)],
                                   "doc_id long, score double")
    feats = spark.createDataFrame([(1, 10.0), (2, 1.0)],
                                  "doc_id long, boost double")
    got = {r["doc_id"]: r["score"]
           for r in function_score(scores, feats, "score * boost").collect()}
    assert got == {1: 20.0, 2: 3.0}


def test_edge_ngrams_expand():
    a = Analyzer(edge_ngrams=(2, 5))
    assert a.tokenize("sparkling x") == [
        ("sp", 0), ("spa", 0), ("spar", 0), ("spark", 0), ("sparkling", 0),
        ("x", 1),
    ]
    items, dl = a.term_freqs("spark spar is")
    assert dl == 3  # norms count source tokens only
    got = {t: f for t, f, _ in items}
    assert got["spar"] == 2 and got["spark"] == 1 and got["is"] == 1


def test_edge_ngrams_shingles_conflict():
    with pytest.raises(ValueError):
        Analyzer(shingles=True, edge_ngrams=(2, 3))


def test_free_text_suggest(spark, tmp_path):
    from lucene_7_x_9_x_spark.index.builder import build_index
    from lucene_7_x_9_x_spark.operators.suggest import free_text_suggest
    from lucene_7_x_9_x_spark.search.searcher import IndexSearcher
    rows = [(0, "fast sort fast merge fast sort"), (1, "fast sort slow scan")]
    d = str(tmp_path / "sg")
    build_index(spark, spark.createDataFrame(rows, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=2, int_keys=True,
                term_shards=2, analyzer=Analyzer(shingles=True))
    s = IndexSearcher(spark, d)
    got = [(r["token"], r["score"])
           for r in free_text_suggest(s.postings_df(), "fast", s.sum_ttf,
                                      k=3).collect()]
    # count(fast)=4; fast->sort 3 times, fast->merge 1
    assert got[0] == ("sort", 3 / 4.0)
    assert got[1] == ("merge", 1 / 4.0)
    # third is a backoff unigram: 0.4 * count/total, 10 tokens total
    assert got[2][1] == pytest.approx(0.4 * 4 / 10.0)  # 'fast' itself
    # unseen context -> pure backoff, still returns suggestions
    back = free_text_suggest(s.postings_df(), "zzz", s.sum_ttf, k=2).collect()
    assert len(back) == 2 and back[0]["score"] == pytest.approx(0.4 * 4 / 10)


def test_synonym_expansion():
    a = Analyzer(synonyms={"fast": ("swift", "quick")})
    assert a.tokenize("fast sort") == [
        ("fast", 0), ("swift", 0), ("quick", 0), ("sort", 1)]
    items, dl = a.term_freqs("fast sort fast")
    assert dl == 3  # synonyms are norm-discounted overlaps
    got = {t: (f, ps) for t, f, ps in items}
    assert got["swift"] == got["fast"] == (2, [0, 2])
    with pytest.raises(ValueError):
        Analyzer(synonyms={"a": ("b",)}, shingles=True)


def test_synonym_index_phrase_alignment(spark, tmp_path):
    """Synonyms share the original's position, so a phrase using the synonym
    matches where the original phrase does (SynonymGraphFilter keepOrig)."""
    from lucene_7_x_9_x_spark.index.builder import build_index
    from lucene_7_x_9_x_spark.search import query as Q
    from lucene_7_x_9_x_spark.search.searcher import IndexSearcher
    rows = [(0, "fast sort wins"), (1, "sort fast loses")]
    d = str(tmp_path / "syn")
    build_index(spark, spark.createDataFrame(rows, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=2, int_keys=True,
                term_shards=2,
                analyzer=Analyzer(synonyms={"fast": ("swift",)}))
    s = IndexSearcher(spark, d)
    td = s.search(Q.PhraseQuery(("swift", "sort")), k=5)
    assert [int(k) for k in td.hits["key"]] == [0]

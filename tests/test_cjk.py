"""CJKAnalyzer-analog bigrams + per-lang analyzer routing (round 4).

Reference behavior: analysis/common/src/java/org/apache/lucene/analysis/cjk/
CJKBigramFilter.java (HAN bigrams, no unigram output, isolated ideographs stay
unigrams) and CJKAnalyzer.java; routing mirrors PerFieldAnalyzerWrapper keyed
on the corpus ``lang`` column.
"""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.analysis.tokenizer import CJK, STANDARD, Analyzer
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


def toks(an, text):
    return [t for t, _ in an.tokenize(text)]


def test_bigram_run():
    assert toks(CJK, "一二三") == ["一二", "二三"]


def test_isolated_ideograph_stays_unigram():
    assert toks(CJK, "一 hello 二") == ["一", "hello", "二"]


def test_latin_breaks_runs():
    assert toks(CJK, "一二 spark 三四五") == [
        "一二", "spark", "三四", "四五"]


def test_whitespace_between_ideographs_still_bigrams():
    # CJKBigramFilter buffers adjacent HAN-type tokens in the STREAM; a space
    # emits no token, so the run continues (Lucene behavior)
    assert toks(CJK, "一 二") == ["一二"]


def test_positions_sequential_after_fold():
    got = CJK.tokenize("一二三 spark")
    assert got == [("一二", 0), ("二三", 1), ("spark", 2)]


def test_standard_analyzer_unaffected():
    assert toks(STANDARD, "一二三") == ["一", "二", "三"]


def test_term_freqs_matches_tokenize():
    text = "一二三 spark 一二"
    items, doclen = CJK.term_freqs(text)
    flat = {}
    for t, p in CJK.tokenize(text):
        flat.setdefault(t, []).append(p)
    assert doclen == len(CJK.tokenize(text))
    assert {t: ps for t, _, ps in items} == flat


def test_routed_build_and_search(spark, tmp_path):
    rows = [
        (0, "一二三四", "zh"),          # bigrams 一二 二三 三四
        (1, "spark 一二 fast", "zh"),   # mixed
        (2, "spark fast sort", "en"),   # standard path
        (3, "一二三", "en"),            # en routing: unigrams (no bigrams!)
    ]
    d = str(tmp_path / "cjk_idx")
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    build_index(spark, df, "doc_id", "text", d, docs_per_segment=2,
                int_keys=True, term_shards=4,
                analyzer_by_lang={"zh": CJK})
    s = IndexSearcher(spark, d)
    td = s.search(Q.TermQuery("一二"), k=10)
    assert sorted(int(k) for k in td.hits["key"]) == [0, 1]
    # doc 3 went through STANDARD: unigram 二 present, bigram absent
    td_uni = s.search(Q.TermQuery("二"), k=10)
    assert sorted(int(k) for k in td_uni.hits["key"]) == [3]
    # english term matched across routes
    td_en = s.search(Q.TermQuery("spark"), k=10)
    assert sorted(int(k) for k in td_en.hits["key"]) == [1, 2]
    # doclen reflects emitted bigram tokens: doc 0 has 3 tokens (norm path)
    docs = s.docs_df().toPandas().set_index("key")
    assert int(docs.loc["0", "doclen"]) == 3
    assert int(docs.loc["3", "doclen"]) == 3


def test_phrase_over_bigrams(spark, tmp_path):
    # consecutive bigrams form phrases: 一二 followed by 二三
    rows = [(0, "一二三", "zh"), (1, "一二 spark 二三", "zh")]
    d = str(tmp_path / "cjk_ph")
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    build_index(spark, df, "doc_id", "text", d, docs_per_segment=4,
                int_keys=True, term_shards=4, analyzer_by_lang={"zh": CJK})
    s = IndexSearcher(spark, d)
    td = s.search(Q.PhraseQuery(("一二", "二三")), k=10)
    assert [int(k) for k in td.hits["key"]] == [0]

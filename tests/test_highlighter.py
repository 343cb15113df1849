"""Highlighter fragments + tagging (Highlighter/SimpleFragmenter analog)."""

from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.highlighter import (highlight_text,
                                                     query_terms)


def test_basic_tagging():
    frags = highlight_text("spark makes the index fast", ["spark", "index"])
    assert frags == ["<b>spark</b> makes the <b>index</b> fast"]


def test_case_insensitive_match_preserves_original():
    frags = highlight_text("Spark is GREAT", ["spark", "great"])
    assert frags == ["<b>Spark</b> is <b>GREAT</b>"]


def test_fragment_selection_prefers_matches():
    text = ("filler words here with nothing relevant at all in this span . " * 3
            + "the spark engine builds an index quickly . "
            + "more filler trailing words without matches . " * 3)
    frags = highlight_text(text, ["spark", "index"], fragment_size=60,
                           max_fragments=1)
    assert len(frags) == 1
    assert "<b>spark</b>" in frags[0] and "<b>index</b>" in frags[0]


def test_no_match_returns_first_fragment_untagged():
    frags = highlight_text("just some plain text", ["absent"])
    assert frags == ["just some plain text"]


def test_empty_text():
    assert highlight_text("", ["x"]) == []


def test_query_terms_extraction():
    q = Q.BooleanQuery(
        must=(Q.TermQuery("a1"),),
        should=(Q.PhraseQuery(("b1", "c1")),),
        must_not=(Q.TermQuery("nope"),))
    assert query_terms(q) == {"a1", "b1", "c1"}


def test_custom_tags_and_max_fragments():
    text = "aa xx . " * 5
    frags = highlight_text(text, ["xx"], pre_tag="[", post_tag="]",
                           fragment_size=10, max_fragments=2)
    assert len(frags) == 2
    assert all("[xx]" in f for f in frags)

"""RemoveDuplicatesTokenFilter analog (analysis/common miscellaneous;
demos TestRemoveDuplicatesTokenFilter.java, the factory test): duplicates
are dropped only when term AND position both match."""

from lucene_7_x_9_x_spark.analysis.tokenizer import Analyzer


def test_same_term_same_position_dropped():
    # a synonym rule that re-emits the original term stacks a duplicate at
    # posIncrement 0 — exactly the demo's filter input
    a = Analyzer(synonyms={"usa": ("usa", "us")}, remove_duplicates=True)
    assert a.tokenize("usa trip") == [("usa", 0), ("us", 0), ("trip", 1)]


def test_same_term_different_position_kept():
    a = Analyzer(remove_duplicates=True)
    assert a.tokenize("go go go") == [("go", 0), ("go", 1), ("go", 2)]


def test_term_freqs_matches_tokenize():
    a = Analyzer(synonyms={"usa": ("usa", "us")}, remove_duplicates=True)
    tf, doclen = a.term_freqs("usa usa trip")
    got = {t: (f, ps) for t, f, ps in tf}
    # each 'usa' occurrence emits one surviving original + one 'us' overlap
    assert got["usa"] == (2, [0, 1])
    assert got["us"] == (2, [0, 1])
    assert got["trip"] == (1, [2])
    # norm counts base tokens only (discountOverlaps) — dedup can't change it
    assert doclen == 3


def test_off_by_default_duplicates_survive():
    a = Analyzer(synonyms={"usa": ("usa", "us")})
    tf, _ = a.term_freqs("usa")
    got = {t: f for t, f, _ in tf}
    assert got["usa"] == 2  # original + re-emitted synonym, undeduped


def test_phonetic_synonym_collision_deduped():
    # synonym injects a token equal to the phonetic code of the original at
    # the same position -> the stacked injectors collide; dedup collapses it
    a = Analyzer(synonyms={"robert": ("r163",)}, phonetic="soundex",
                 remove_duplicates=True)
    toks = a.tokenize("robert")
    assert toks.count(("r163", 0)) == 1
    a2 = Analyzer(synonyms={"robert": ("r163",)}, phonetic="soundex")
    assert a2.tokenize("robert").count(("r163", 0)) == 2

"""MultiPhraseQuery, Rescorer, spell suggest."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.operators.suggest import spell_suggest
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.rescorer import rescore
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

ROWS = [
    (0, "the quick brown fox"),
    (1, "the fast brown fox"),
    (2, "a slow brown snail"),
    (3, "quick red fox with brown tail"),
    (4, "brown quick fox"),
    (5, "nothing relevant here"),
]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(ROWS, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=3, int_keys=True,
                term_shards=4)
    return d


def test_multi_phrase_matches_either_alternative(spark, idx):
    s = IndexSearcher(spark, idx)
    # ("quick"|"fast") followed by "brown": docs 0, 1 (not 4: 'brown quick')
    q = Q.MultiPhraseQuery((("quick", "fast"), ("brown",)))
    td = s.search(q, k=10)
    assert sorted(int(k) for k in td.hits["key"]) == [0, 1]


def test_multi_phrase_equals_phrase_when_single_alternatives(spark, idx):
    s = IndexSearcher(spark, idx)
    mp = s.search(Q.MultiPhraseQuery((("brown",), ("fox",))), k=10).hits
    ph = s.search(Q.PhraseQuery(("brown", "fox")), k=10).hits
    assert list(mp["key"]) == list(ph["key"])
    np.testing.assert_array_equal(mp["score"].values, ph["score"].values)


def test_rescorer_reranks_with_second_query(spark, idx):
    s = IndexSearcher(spark, idx)
    first = Q.TermQuery("brown")
    second = Q.TermQuery("snail")
    base = s.search(first, k=10).hits
    out = rescore(s, first, second, k=10, window_size=10, second_weight=10.0)
    # doc 2 (the only 'snail' doc) must now rank first
    assert int(out.iloc[0]["key"]) == 2
    # non-matching docs keep their first-pass score
    base_scores = {int(r.key): float(r.score) for r in base.itertuples()}
    for r in out.itertuples():
        if int(r.key) != 2:
            assert float(r.score) == pytest.approx(base_scores[int(r.key)])


def test_spell_suggest_orders_by_distance_then_df(spark, idx):
    s = IndexSearcher(spark, idx)
    out = spell_suggest(s.postings_df(), "quik", max_edits=2, k=3).toPandas()
    assert list(out["term"])[0] == "quick"  # distance 1
    assert all(out["distance"] <= 2)

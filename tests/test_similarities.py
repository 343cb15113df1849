"""Pluggable Similarity: Classic TF-IDF and Boolean vs default BM25."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions.similarities import (BooleanSimilarity,
                                                         ClassicSimilarity,
                                                         make_similarity)
from lucene_7_x_9_x_spark.functions.smallfloat import int_to_byte4
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

ROWS = [
    (0, "spark spark spark spark filler"),
    (1, "spark alone here today friend"),
    (2, "totally unrelated content row"),
    (3, "spark " + "pad " * 60),
]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(ROWS, "doc_id long, text string"),
                "doc_id", "text", d, docs_per_segment=2, int_keys=True,
                term_shards=4)
    return d


def test_classic_formula_unit():
    sim = ClassicSimilarity(doc_count=100, sum_ttf=1000, dtype=np.float64)
    w = sim.weight(df=9, boost=1.0)
    assert w == pytest.approx(np.log(101 / 10.0) + 1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    s = sim.score(np.array([4]), np.array([nb]), w)
    assert s[0] == pytest.approx(float(w) * 2.0 * (1.0 / 4.0))  # sqrt(4)/sqrt(16)


def test_boolean_similarity_constant(spark, idx):
    s = IndexSearcher(spark, idx, similarity="boolean")
    td = s.search(Q.TermQuery("spark"), k=10)
    assert set(np.round(td.hits["score"], 6)) == {1.0}
    assert len(td.hits) == 3
    # tie-break by (segment order, docid) -> key order here
    assert [int(k) for k in td.hits["key"]] == [0, 1, 3]


def test_classic_ranks_by_tf_over_length(spark, idx):
    s = IndexSearcher(spark, idx, similarity="classic")
    td = s.search(Q.TermQuery("spark"), k=10)
    keys = [int(k) for k in td.hits["key"]]
    # doc 0: tf=4, dl=5 -> sqrt(4)/sqrt(5); doc 1: 1/sqrt(5); doc 3: 1/sqrt(61q)
    assert keys[0] == 0 and keys[-1] == 3


def test_classic_pruned_equals_exhaustive(spark, idx):
    s = IndexSearcher(spark, idx, similarity="classic")
    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("filler")))
    a = s.search(q, k=4, pruning=True).hits
    b = s.search(q, k=4, pruning=False).hits
    assert list(a["key"]) == list(b["key"])
    np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_registry_unknown():
    with pytest.raises(ValueError):
        make_similarity("nope", 1, 1)
    assert isinstance(make_similarity("boolean", 1, 1), BooleanSimilarity)


# ---- LMDirichlet + DFR InL2 (round 4) ---------------------------------------

def test_lmdirichlet_formula_unit():
    from lucene_7_x_9_x_spark.functions.similarities import (
        LMDirichletSimilarity)
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    sim = LMDirichletSimilarity(doc_count=100, sum_ttf=1000,
                                term_ttf={"t": 42})
    w = sim.weight_for_term("t", 9, 1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    dlq = float(byte4_to_int(np.array([nb]))[0])
    mu, p = 2000.0, (42 + 1.0) / (1000 + 1.0)
    exp = np.float32(np.log(1 + 4 / (mu * p)) + np.log(mu / (dlq + mu)))
    s = sim.score(np.array([4]), np.array([nb]), w)
    assert s[0] == exp
    # clamp: a rare term in a long doc can go negative -> 0
    sim2 = LMDirichletSimilarity(doc_count=100, sum_ttf=10,
                                 term_ttf={"t": 9})
    w2 = sim2.weight_for_term("t", 9, 1.0)
    long_nb = int(int_to_byte4(np.array([100000]))[0])
    assert sim2.score(np.array([1]), np.array([long_nb]), w2)[0] == 0.0


def test_dfr_inl2_formula_unit():
    from lucene_7_x_9_x_spark.functions.similarities import DFRSimilarityInL2
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    sim = DFRSimilarityInL2(doc_count=100, sum_ttf=1000)
    w = sim.weight_for_term("t", 9, 1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    dlq = float(byte4_to_int(np.array([nb]))[0])
    avgfl = 1000 / 100.0
    tfn = 4 * np.log2(1 + avgfl / dlq)
    exp = np.float32(np.log2(101 / 9.5) * (1 - 1 / (1 + tfn)))
    s = sim.score(np.array([4]), np.array([nb]), w)
    assert s[0] == pytest.approx(float(exp), rel=1e-7)


def test_lm_dfr_monotone_block_bound():
    """max_score(max_freq, min_norm) must upper-bound every (freq<=max,
    norm>=min) score — the block-max pruning safety contract."""
    from lucene_7_x_9_x_spark.functions.similarities import (
        DFRSimilarityInL2, LMDirichletSimilarity)
    for sim in (LMDirichletSimilarity(50, 700, term_ttf={"t": 30}),
                DFRSimilarityInL2(50, 700)):
        w = sim.weight_for_term("t", 20, 1.3)
        bound = sim.max_score(7, int(int_to_byte4(np.array([3]))[0]), w)
        freqs = np.arange(1, 8)
        for dl in (3, 10, 50, 300):
            nb = int(int_to_byte4(np.array([dl]))[0])
            s = sim.score(freqs, np.full(7, nb), w)
            assert (s <= bound + 1e-9).all()


def test_lmdirichlet_engine_topk(spark, idx):
    """Engine top-k matches a straight recomputation from the corpus."""
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    s = IndexSearcher(spark, idx, similarity="lmdirichlet")
    td = s.search(Q.TermQuery("spark"), k=10)
    # corpus stats: docs 0..3 all non-empty; doclens 5,5,4,61; spark ttf=6 df=3
    sttf = 5 + 5 + 4 + 61
    p = (6 + 1.0) / (sttf + 1.0)
    mu = 2000.0
    exp = {}
    for key, dl, f in ((0, 5, 4), (1, 5, 1), (3, 61, 1)):
        dlq = float(byte4_to_int(int_to_byte4(np.array([dl])))[0])
        v = np.log(1 + f / (mu * p)) + np.log(mu / (dlq + mu))
        v = v if v > 0.0 else 0.0  # LMDirichletSimilarity.java:87 clamp
        exp[key] = float(np.float32(v))
    got = {int(k): float(v) for k, v in zip(td.hits["key"], td.hits["score"])}
    assert got == exp


def test_dfr_pruned_equals_exhaustive(spark, idx):
    s = IndexSearcher(spark, idx, similarity="dfr_inl2")
    q = Q.BooleanQuery(should=(Q.TermQuery("spark"), Q.TermQuery("filler")))
    a = s.search(q, k=4, pruning=True).hits
    b = s.search(q, k=4, pruning=False).hits
    assert list(a["key"]) == list(b["key"])
    np.testing.assert_array_equal(a["score"].values, b["score"].values)


def test_lm_phrase_multisim_sum(spark, idx):
    """Phrase scoring under LM sums per-term float32 scores with the phrase
    freq (MultiSimilarity.MultiSimScorer)."""
    s = IndexSearcher(spark, idx, similarity="lmdirichlet")
    td = s.search(Q.PhraseQuery(("spark", "alone")), k=10)
    assert [int(k) for k in td.hits["key"]] == [1]
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    sttf = 75
    mu = 2000.0
    dlq = float(byte4_to_int(int_to_byte4(np.array([5])))[0])
    tot = np.float32(0.0)
    for ttf in (6, 1):  # spark ttf=6, alone ttf=1
        p = (ttf + 1.0) / (sttf + 1.0)
        tot += np.float32(np.log(1 + 1 / (mu * p)) + np.log(mu / (dlq + mu)))
    assert float(td.hits["score"].iloc[0]) == float(tot)


# ---- LM Jelinek-Mercer + Axiomatic F2EXP + IB LL-D (round 4) -----------------

def test_lmjelinekmercer_formula_unit():
    from lucene_7_x_9_x_spark.functions.similarities import (
        LMJelinekMercerSimilarity)
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    sim = LMJelinekMercerSimilarity(doc_count=100, sum_ttf=1000,
                                    term_ttf={"t": 42})
    w = sim.weight_for_term("t", 9, 1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    dlq = float(byte4_to_int(np.array([nb]))[0])
    p = (42 + 1.0) / (1000 + 1.0)
    exp = np.float32(np.log(1 + (0.9 * 4 / dlq) / (0.1 * p)))
    assert sim.score(np.array([4]), np.array([nb]), w)[0] == exp
    with pytest.raises(ValueError):
        LMJelinekMercerSimilarity(10, 10, lam=0.0)


def test_axiomatic_f2exp_formula_unit():
    from lucene_7_x_9_x_spark.functions.similarities import AxiomaticF2EXP
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    sim = AxiomaticF2EXP(doc_count=100, sum_ttf=1000)
    w = sim.weight(df=9, boost=1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    dlq = float(byte4_to_int(np.array([nb]))[0])
    tfln = 4.0 / (4.0 + 0.25 + 0.25 * dlq / 10.0)
    exp = np.float32(tfln * (101.0 / 9.0) ** 0.35)
    assert sim.score(np.array([4]), np.array([nb]), w)[0] == exp


def test_ib_ll_d_formula_unit():
    from lucene_7_x_9_x_spark.functions.similarities import IBSimilarityLLD
    from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int
    sim = IBSimilarityLLD(doc_count=100, sum_ttf=1000)
    w = sim.weight(df=9, boost=1.0)
    nb = int(int_to_byte4(np.array([16]))[0])
    dlq = float(byte4_to_int(np.array([nb]))[0])
    lam = float(np.float32(10.0 / 101.0))  # LambdaDF computes in float
    tfn = 4 * np.log2(1 + 10.0 / dlq)
    exp = np.float32(-np.log(lam / (tfn + lam)))
    assert sim.score(np.array([4]), np.array([nb]), w)[0] == exp


def test_new_sims_monotone_block_bound():
    from lucene_7_x_9_x_spark.functions.similarities import (
        AxiomaticF2EXP, IBSimilarityLLD, LMJelinekMercerSimilarity)
    for sim in (LMJelinekMercerSimilarity(50, 700, term_ttf={"t": 30}),
                AxiomaticF2EXP(50, 700), IBSimilarityLLD(50, 700)):
        w = sim.weight_for_term("t", 20, 1.3)
        bound = sim.max_score(7, int(int_to_byte4(np.array([3]))[0]), w)
        freqs = np.arange(1, 8)
        for dl in (3, 10, 50, 300):
            nb = int(int_to_byte4(np.array([dl]))[0])
            s = sim.score(freqs, np.full(7, nb), w)
            assert (s <= bound + 1e-9).all()


def test_new_sims_engine_rank_sanity(spark, idx):
    """All three new sims rank the heavy-tf short doc first on 'spark'."""
    for name in ("lmjelinekmercer", "axiomatic_f2exp", "ib_ll_d"):
        s = IndexSearcher(spark, idx, similarity=name)
        td = s.search(Q.TermQuery("spark"), k=10)
        assert len(td.hits) == 3, name
        assert int(td.hits["key"].iloc[0]) == 0, name
        assert (td.hits["score"] > 0).all(), name


def test_explain_value_matches_search_all_sims(spark, idx):
    """explain(q, seg, docid)['value'] equals the hit's score for EVERY
    registered scoring similarity (the kernel arithmetic is shared)."""
    for name in ("bm25", "classic", "boolean", "lmdirichlet", "dfr_inl2",
                 "lmjelinekmercer", "axiomatic_f2exp", "ib_ll_d"):
        s = IndexSearcher(spark, idx, similarity=name)
        td = s.search(Q.TermQuery("spark"), k=1)
        row = td.hits.iloc[0]
        ex = s.explain(Q.TermQuery("spark"),
                       int(row["segment_id"]), int(row["docid"]))
        assert ex["match"] and ex["value"] == float(row["score"]), name

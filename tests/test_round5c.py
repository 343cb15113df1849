"""Round-5c surface: grouping DistinctValuesCollector analog, KNN
equal-score docid tie-break, and merge-during-refresh snapshot isolation.

Reference behaviors: lucene/grouping/DistinctValueCollectorTest.java (per-
group distinct COUNT_FIELD values incl. the null entry for docs missing the
field), TestKnnTieBreak.java / TieBreakDocIdKNNQuery.java (equal-score KNN
hits order by docid asc), io/index/MergeDuringRefreshTest.java (a reader
opened before a merge keeps reading its own commit point unchanged).
"""

import numpy as np

from lucene_7_x_9_x_spark.operators.collectors import distinct_values_per_group
from lucene_7_x_9_x_spark.pipeline.similarity import cosine_top_k


def test_distinct_values_per_group(spark):
    rows = [
        # group 1: values {1, 2} plus a missing-field doc -> null entry
        (1, "g1", "1"), (2, "g1", "1"), (3, "g1", "2"), (4, "g1", None),
        # group 2: only missing-field docs -> just the null entry
        (5, "g2", None),
        # group 3: one value
        (6, "g3", "7"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v string")
    got = {(r["g"], r["v"])
           for r in distinct_values_per_group(df, "g", "v").collect()}
    assert got == {("g1", "1"), ("g1", "2"), ("g1", None),
                   ("g2", None), ("g3", "7")}


def test_knn_equal_score_tie_breaks_by_id_asc(spark):
    # five vectors, three of them IDENTICAL (ids 30, 10, 20) -> equal cosine
    # vs any query; TieBreakDocIdKNNQuery semantics: ties order by id asc
    dup = [1.0, 0.0, 0.0]
    rows = [(30, dup), (10, dup), (20, dup),
            (40, [0.0, 1.0, 0.0]), (50, [0.7, 0.7, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "query_id long, query_vec array<double>")
    out = (cosine_top_k(vecs, q, k=4)
           .orderBy("rank").collect())
    assert [r["vec_id"] for r in out] == [10, 20, 30, 50]
    assert np.isclose(out[0]["cosine"], out[2]["cosine"])  # genuine ties


def test_merge_during_refresh_snapshot_isolation(spark, tmp_path):
    from lucene_7_x_9_x_spark.index.builder import build_index
    from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
    from lucene_7_x_9_x_spark.index.merge import execute_merge
    from lucene_7_x_9_x_spark.search import query as Q
    from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma" if i % 2 else f"alpha w{i % 5}")
         for i in range(40)], "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, "doc_id", "text", idx, docs_per_segment=10,
                segments_per_wave=2, term_shards=4, int_keys=True)

    before = IndexSearcher(spark, idx)           # the "NRT reader"
    h_before = before.search(Q.TermQuery("beta"), k=10).hits

    cat = IndexCatalog(idx)
    segs = [s["segment_id"] for s in cat.snapshot()["segments"]][:2]
    execute_merge(spark, idx, segs)              # merge during "refresh"

    # the pre-merge reader still reads its own commit point, bit-unchanged
    h_again = before.search(Q.TermQuery("beta"), k=10).hits
    assert list(h_again.key) == list(h_before.key)
    assert np.allclose(h_again.score, h_before.score)

    # a refreshed reader sees the merged index with identical results
    after = IndexSearcher(spark, idx)
    h_after = after.search(Q.TermQuery("beta"), k=10).hits
    assert list(h_after.key) == list(h_before.key)
    assert np.allclose(h_after.score, h_before.score)

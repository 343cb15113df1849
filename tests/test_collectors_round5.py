"""Round-5 collector surface: SortedSet facet counts, GroupingSearch full
shape, expression sort (expressions-module analog). Small in-memory frames
with hand-computed expectations."""

from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.operators.collectors import (
    grouping_search, sorted_set_facet_counts)
from lucene_7_x_9_x_spark.operators.function_score import expression_sort


def test_sorted_set_facet_counts_distinct_per_doc(spark):
    rows = [
        (1, ["red", "blue", "red"]),   # duplicate value counts ONCE
        (2, ["blue"]),
        (3, ["green", "blue"]),
        (4, []),                       # empty set contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, tags array<string>")
    got = {r["value"]: r["cnt"]
           for r in sorted_set_facet_counts(df, "tags").collect()}
    assert got == {"red": 1, "blue": 3, "green": 1}


def test_grouping_search_heads_sizes_and_total(spark):
    rows = [
        # group a: scores 9, 7, 5 (size 3, head 9)
        (1, "a", 9.0), (2, "a", 7.0), (3, "a", 5.0),
        # group b: scores 8, 8 (size 2, head 8; tie within group -> id asc)
        (4, "b", 8.0), (5, "b", 8.0),
        # group c: single doc score 10 (head 10)
        (6, "c", 10.0),
        # group d: score 1 — 4th group, cut by n_groups=3
        (7, "d", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, score double")
    out = grouping_search(df, "g", n_groups=3, docs_per_group=2,
                          id_col="doc_id", score_col="score").collect()
    # group order by head score desc: c (10), a (9), b (8); d cut
    assert [r["g"] for r in out] == ["c", "a", "a", "b", "b"]
    assert [r["doc_id"] for r in out] == [6, 1, 2, 4, 5]
    assert [r["rnk"] for r in out] == [1, 1, 2, 1, 2]
    assert [r["group_size"] for r in out] == [1, 3, 3, 2, 2]
    assert all(r["total_groups"] == 4 for r in out)  # d still counted


def test_grouping_search_head_tie_breaks_by_group(spark):
    rows = [(1, "b", 5.0), (2, "a", 5.0), (3, "c", 4.0)]
    df = spark.createDataFrame(rows, "doc_id long, g string, score double")
    out = grouping_search(df, "g", n_groups=2, docs_per_group=1,
                          id_col="doc_id", score_col="score").collect()
    assert [r["g"] for r in out] == ["a", "b"]


def test_expression_sort_orders_by_compiled_expression(spark):
    scores = spark.createDataFrame(
        [(1, 1.0), (2, 3.0), (3, 2.0)], "doc_id long, score double")
    feats = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 16)], "doc_id long, n long")
    # score + sqrt(n): doc1 = 11, doc2 = 3, doc3 = 6
    out = expression_sort(scores, feats, "score + sqrt(n)", k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 3]
    assert abs(out[0]["sort_value"] - 11.0) < 1e-12


def test_expression_sort_tie_breaks_by_id(spark):
    scores = spark.createDataFrame(
        [(9, 2.0), (4, 2.0)], "doc_id long, score double")
    feats = spark.createDataFrame(
        [(9, 1), (4, 1)], "doc_id long, n long")
    out = expression_sort(scores, feats, "score + n", k=2).collect()
    assert [r["doc_id"] for r in out] == [4, 9]

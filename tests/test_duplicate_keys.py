"""Duplicate keys within a segment must not cross-match the docid join.

Lucene has no unique-key constraint (IndexWriter.addDocument happily indexes
two docs with equal field values); the builder's broadcast docid-map fast path
joins on (segment_id, key), so duplicate keys would cross-match and inflate
df/ttf. index_wave probes for duplicates and falls back to the direct-window
path; these tests pin both behaviors.
"""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher


def test_duplicate_keys_index_and_search(spark, tmp_path):
    rows = [
        ("a", "spark engine"),
        ("a", "merge policy table"),      # same key, different text
        ("b", "spark spark table"),
        ("b", "spark spark table"),       # same key, identical text
        ("c", "lonely document"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    d = str(tmp_path / "dupidx")
    build_index(spark, df, "url", "text", d, docs_per_segment=16,
                term_shards=4)
    check_index(spark, d)

    s = IndexSearcher(spark, d)
    # 'spark' appears in docs 0, 2, 3 -> df == 3 (cross-match would inflate it)
    docs = spark.read.parquet(f"{d}/docs")
    assert docs.count() == 5
    post = spark.read.parquet(f"{d}/postings").where(F.col("term") == "spark")
    assert post.agg(F.sum("df")).first()[0] == 3
    td = s.search(Q.TermQuery("spark"), k=10)
    assert len(td.hits) == 3
    # every doc got exactly one docid; doclens preserved per-copy
    per_seg = (docs.groupBy("segment_id", "docid").count()
               .agg(F.max("count")).first()[0])
    assert per_seg == 1
    assert sorted(r.doclen for r in docs.collect()) == [2, 2, 3, 3, 3]


def test_unique_keys_still_fast_path(spark, tmp_path):
    rows = [(str(i), f"doc number {i} spark") for i in range(10)]
    df = spark.createDataFrame(rows, "url string, text string")
    d = str(tmp_path / "uniqidx")
    build_index(spark, df, "url", "text", d, docs_per_segment=16,
                term_shards=4)
    check_index(spark, d)
    s = IndexSearcher(spark, d)
    assert len(s.search(Q.TermQuery("spark"), k=20).hits) == 10

"""IndexOptions ladder + omitNorms + RangeField relation queries.

Semantics sources (behavior only):
  - o.a.l/index/IndexOptions.java and demo LuceneDemo8.4.0/.../io/search/
    IndexOptionTest.java (per-field DOCS / DOCS_AND_FREQS /
    DOCS_AND_FREQS_AND_POSITIONS);
  - o.a.l/document/StringField.java:46-47 (omitNorms default for keywords);
  - o.a.l/document/RangeFieldQuery.java:77-230 and demo
    LuceneDemo8.4.0/.../rangeField/IntRangeTest.java (the 4-doc fixture and
    its intersects assertion reproduced verbatim below).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.operators.rangefield import (
    RELATIONS, range_query, range_relation_predicate)
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

BASE = [
    (0, "spark index engine"),
    (1, "spark spark spark spark table"),
    (2, "table scan spark spark"),
    (3, "merge sort table"),
    (4, "spark merge index table scan extra words here"),
]


def _mk(spark):
    return spark.createDataFrame(BASE, "doc_id long, text string")


def _build(spark, tmp_path, name, **kw):
    d = str(tmp_path / name)
    build_index(spark, _mk(spark), "doc_id", "text", d,
                docs_per_segment=3, int_keys=True, term_shards=4, **kw)
    return d


def _scores(searcher, term="spark", k=10):
    td = searcher.search(Q.TermQuery(term), k=k)
    return {int(r.key): float(r.score) for r in td.hits.itertuples()}


def test_docs_only_scores_tf1(spark, tmp_path):
    """IndexOptions.DOCS: every match scores as tf=1 — doc 1 (tf=4) must score
    identically to an equal-length tf=1 doc, i.e. scores depend only on the
    quantized length."""
    full = IndexSearcher(spark, _build(spark, tmp_path, "full"))
    docs = IndexSearcher(
        spark, _build(spark, tmp_path, "docs", index_options="docs"))
    s_full = _scores(full)
    s_docs = _scores(docs)
    assert set(s_full) == set(s_docs)  # same match set
    # same-length docs score equal under DOCS regardless of tf:
    # doc 1 (tf=4, len 5) vs an artificial check — compute expected with tf=1
    # by comparing monotonicity: under DOCS, longer doc => lower score, no tf
    # influence. doc 1 has the highest tf; under full scoring it outranks
    # doc 0 (tf=1, len 3); under DOCS the shorter doc 0 must win.
    assert s_full[1] > s_full[0]
    assert s_docs[0] > s_docs[1]


def test_docs_only_ttf_equals_df(spark, tmp_path):
    idx = _build(spark, tmp_path, "docs2", index_options="docs")
    s = IndexSearcher(spark, idx)
    post = spark.read.parquet(f"{idx}/postings")
    bad = post.where(F.col("ttf") != F.col("df")).count()
    assert bad == 0


def test_positional_query_refused_without_positions(spark, tmp_path):
    for opts in ("docs", "freqs"):
        idx = _build(spark, tmp_path, f"nopos_{opts}", index_options=opts)
        s = IndexSearcher(spark, idx)
        for q in (Q.PhraseQuery(("spark", "table")),
                  Q.SpanNearQuery((Q.SpanTermQuery("spark"),
                                   Q.SpanTermQuery("table")), slop=1,
                                  in_order=True)):
            with pytest.raises(ValueError, match="without position data"):
                s.search(q, k=5)
        # non-positional queries still work
        assert _scores(s)


def test_freqs_index_scores_match_full(spark, tmp_path):
    """DOCS_AND_FREQS drops positions but keeps tf: term scoring must be
    bit-identical to the full index."""
    full = _scores(IndexSearcher(spark, _build(spark, tmp_path, "f_full")))
    freqs = _scores(IndexSearcher(
        spark, _build(spark, tmp_path, "f_freqs", index_options="freqs")))
    assert full == freqs


def test_omit_norms_scores_ignore_length(spark, tmp_path):
    """omitNorms (StringField.java:46-47): decoded length is 1 for every doc,
    so two docs with equal tf score EQUAL regardless of their lengths."""
    idx = _build(spark, tmp_path, "nonorm", omit_norms=True)
    s = IndexSearcher(spark, idx)
    sc = _scores(s)
    # docs 0 (len 3, tf 1) and 4 (len 8, tf 1) — equal tf, very different
    # lengths -> equal scores without norms
    assert sc[0] == pytest.approx(sc[4], rel=0, abs=0)
    docs_tbl = spark.read.parquet(f"{idx}/docs")
    assert docs_tbl.where(F.col("norm_byte") != 1).count() == 0


def test_writer_inherits_index_options(spark, tmp_path):
    """New waves written through IndexWriter keep the recorded DOCS option
    (FieldInfo.java:150: index options never change mid-index)."""
    idx = _build(spark, tmp_path, "w_docs", index_options="docs")
    w = IndexWriter(spark, idx, int_keys=True, docs_per_segment=3)
    assert w.omit_freqs and not w.store_positions
    w.add_documents(
        spark.createDataFrame([(10, "spark spark spark spark spark")],
                              "doc_id long, text string"), "doc_id", "text")
    post = spark.read.parquet(f"{idx}/postings")
    assert post.where(F.col("ttf") != F.col("df")).count() == 0


# --- RangeField ------------------------------------------------------------

# the IntRangeTest.java fixture: 4 docs x 2-dim ranges
DEMO_RANGES = [
    (0, 1, 4, 1, 4),
    (1, 3, 6, 2, 5),
    (2, 8, 10, 8, 10),
    (3, 9, 10, 6, 7),
]
DEMO_DIMS = lambda: [("min1", "max1", 2, 8), ("min2", "max2", 0, 8)]  # noqa


def _ranges_df(spark):
    return spark.createDataFrame(
        DEMO_RANGES, "doc_id long, min1 long, max1 long, min2 long, max2 long")


def test_range_intersects_demo_assertion(spark):
    """IntRangeTest.java:78-85: query [2,0]-[8,8] intersects docs 0, 1, 2."""
    got = sorted(r.doc_id for r in range_query(
        _ranges_df(spark), "intersects", DEMO_DIMS()).collect())
    assert got == [0, 1, 2]


def test_range_relations_cross_checked(spark):
    """Every relation against a brute-force numpy evaluation of the same
    per-dim rules (RangeFieldQuery.java:99,132,165,208)."""
    rows = np.array([r[1:] for r in DEMO_RANGES])  # (min1,max1,min2,max2)
    q = [(2, 8), (0, 8)]

    def brute(rel):
        out = []
        for i, (lo1, hi1, lo2, hi2) in enumerate(rows):
            dims = [(lo1, hi1, *q[0]), (lo2, hi2, *q[1])]
            isect = all(lo <= qh and hi >= ql for lo, hi, ql, qh in dims)
            within = all(lo >= ql and hi <= qh for lo, hi, ql, qh in dims)
            contains = all(lo <= ql and hi >= qh for lo, hi, ql, qh in dims)
            ok = {"intersects": isect, "within": within,
                  "contains": contains, "crosses": isect and not within}[rel]
            if ok:
                out.append(i)
        return out

    df = _ranges_df(spark)
    for rel in RELATIONS:
        got = sorted(r.doc_id for r in
                     range_query(df, rel, DEMO_DIMS()).collect())
        assert got == brute(rel), rel


def test_range_predicate_pushdown(spark):
    """The relation predicate is a plain Catalyst conjunction (no UDF):
    it must appear as a data filter usable for parquet pushdown."""
    df = _ranges_df(spark)
    plan = df.where(range_relation_predicate(
        "intersects", DEMO_DIMS()))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "pythonUDF" not in plan
    assert "Filter" in plan

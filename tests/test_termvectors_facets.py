"""Stored term vectors (tvd sidecar), DrillSideways, range facets, block join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.operators.collectors import (drill_sideways,
                                                       range_facet_counts)
from lucene_7_x_9_x_spark.operators.join import to_parent_block_join
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

ROWS = [
    (0, "alpha beta alpha", "en", "s1"),
    (1, "beta gamma", "en", "s2"),
    (2, "alpha delta", "de", "s1"),
    (3, "gamma gamma gamma", "de", "s2"),
]
SCHEMA = "doc_id long, text string, lang string, source string"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_term_vectors_roundtrip(spark, docs, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=2,
                int_keys=True, term_shards=2, store_term_vectors=True)
    s = IndexSearcher(spark, d)
    assert s.has_term_vectors
    row = (s.docs_df().where(F.col("key").cast("long") == 0)
           .select("segment_id", "docid").first())
    tv = s.term_vector(int(row["segment_id"]), int(row["docid"]))
    assert tv == [("alpha", 2, [0, 2]), ("beta", 1, [1])]
    # absent docid -> empty
    assert s.term_vector(int(row["segment_id"]), 9999) == []


def test_term_vectors_absent_raises(spark, docs, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=2,
                int_keys=True, term_shards=2)
    s = IndexSearcher(spark, d)
    assert not s.has_term_vectors
    with pytest.raises(ValueError):
        s.term_vectors_df()


def test_term_vectors_multi_field_rejected(spark, tmp_path):
    from lucene_7_x_9_x_spark.index.builder import index_wave
    with pytest.raises(ValueError):
        index_wave(None, None, str(tmp_path / "x"), 0, fields=["a"],
                   store_term_vectors=True)


def test_drill_sideways_counts(spark, docs):
    out = {(r["dim"], r["value"]): r["cnt"]
           for r in drill_sideways(docs, {"lang": "en",
                                          "source": "s1"}).collect()}
    # sideways 'lang': docs with source=s1 regardless of lang -> en:1, de:1
    assert out[("lang", "en")] == 1 and out[("lang", "de")] == 1
    # sideways 'source': docs with lang=en -> s1:1, s2:1
    assert out[("source", "s1")] == 1 and out[("source", "s2")] == 1
    # a doc failing BOTH filters contributes nowhere
    assert sum(v for (dim, _), v in out.items() if dim == "lang") == 2


def test_range_facets_overlapping(spark, docs):
    sized = docs.withColumn("n", F.length("text").cast("long"))
    ranges = [("small", 0, 12), ("big", 10, 100), ("all", 0, 100)]
    out = {r["label"]: r["cnt"]
           for r in range_facet_counts(sized, "n", ranges).collect()}
    lens = [len(t) for _, t, _, _ in ROWS]
    assert out["small"] == sum(1 for n in lens if n <= 12)
    assert out["big"] == sum(1 for n in lens if 10 <= n <= 100)
    assert out["all"] == 4  # overlapping ranges both count


def test_block_join_modes(spark):
    cs = spark.createDataFrame(
        [(0, 2.0), (1, 4.0), (2, 6.0)], "child_id long, score double")
    cp = spark.createDataFrame(
        [(0, "p1"), (1, "p1"), (2, "p2"), (3, "p3")],
        "child_id long, parent_id string")
    parents = cp.select("parent_id").distinct()
    got = {m: {r["parent_id"]: r["score"]
               for r in to_parent_block_join(cs, cp, parents,
                                             mode=m).collect()}
           for m in ("max", "total", "avg", "none")}
    assert got["max"] == {"p1": 4.0, "p2": 6.0}
    assert got["total"] == {"p1": 6.0, "p2": 6.0}
    assert got["avg"] == {"p1": 3.0, "p2": 6.0}
    assert got["none"] == {"p1": 1.0, "p2": 1.0}  # p3: no matching child
    with pytest.raises(ValueError):
        to_parent_block_join(cs, cp, parents, mode="nope")


def test_checkindex_validates_tvd(spark, docs, tmp_path):
    from lucene_7_x_9_x_spark.index.checkindex import check_index
    import glob
    import os
    d = str(tmp_path / "idx")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=2,
                int_keys=True, term_shards=2, store_term_vectors=True)
    assert check_index(spark, d) == []
    # corrupting the sidecar (drop one segment's vectors) is detected
    victim = sorted(glob.glob(os.path.join(d, "tvd", "wave=*",
                                           "segment_id=*")))[0]
    import shutil
    shutil.rmtree(victim)
    v = check_index(spark, d)
    assert v and "missing a vector" in v[0]

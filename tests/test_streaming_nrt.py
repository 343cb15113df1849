"""Structured Streaming NRT ingestion: micro-batch -> segment wave -> refresh."""

import os

from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher
from lucene_7_x_9_x_spark.streaming.nrt import committed_batches, stream_index


def _write_batch(spark, src_dir, rows, n):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(src_dir)
    assert spark.read.parquet(src_dir).count() == n


def test_stream_index_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(0, "spark streaming index"),
                              (1, "first batch table")], 2)

    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    q = stream_index(spark, stream, "doc_id", "text", idx,
                     checkpoint_dir=ckpt, docs_per_segment=4, int_keys=True,
                     term_shards=4)
    q.awaitTermination(120)

    s = IndexSearcher(spark, idx)
    assert s.count(Q.TermQuery("spark")) == 1
    assert s.count(Q.MatchAllDocsQuery()) == 2
    n_batches_1 = len(committed_batches(idx))
    assert n_batches_1 >= 1

    # second wave of files -> new availableNow run picks up only the new files
    _write_batch(spark, src, [(2, "second batch spark doc"),
                              (3, "more streaming text")], 4)
    stream2 = (spark.readStream
               .schema("doc_id long, text string")
               .option("maxFilesPerTrigger", "1")
               .parquet(src))
    q2 = stream_index(spark, stream2, "doc_id", "text", idx,
                      checkpoint_dir=ckpt, docs_per_segment=4, int_keys=True,
                      term_shards=4)
    q2.awaitTermination(120)

    # NRT refresh: a NEW searcher sees the new snapshot
    s2 = IndexSearcher(spark, idx)
    assert s2.count(Q.MatchAllDocsQuery()) == 4
    assert s2.count(Q.TermQuery("spark")) == 2
    assert len(committed_batches(idx)) > n_batches_1
    # the old reader still sees its point-in-time view (snapshot isolation)
    assert s.count(Q.MatchAllDocsQuery()) == 2

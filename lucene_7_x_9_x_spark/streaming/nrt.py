"""NRT / streaming ingestion: Structured Streaming -> segment waves.

Lucene's streaming story is near-real-time refresh: buffered docs flush as new
segments, readers reopen to see them (DirectoryReader.java:96 open(IndexWriter),
demo LuceneDemo8.6.0/.../MergeDuringRefreshTest.java). SURVEY §2.6 maps this to
incremental batch appends; this module is the Structured Streaming wrapper:
each micro-batch becomes one wave of new segments via IndexWriter.add_documents
(foreachBatch), and every snapshot commit is a refresh point — an IndexSearcher
constructed after the commit sees the new docs.

Exactly-once: foreachBatch may replay a batch after a restart, so committed
batch ids are recorded next to the snapshot catalog (batches.json, written via
tmp+rename like snapshots) and replayed batches are skipped — the add is
idempotent at wave granularity, same as the kill-resume contract of the batch
builder.

Scale notes: one micro-batch = one wave = O(batch/docs_per_segment) new
segments; maybe_merge() (optionally run every N batches) keeps the segment
count logarithmic exactly like Lucene's background TieredMergePolicy loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..analysis.tokenizer import Analyzer, STANDARD
from ..index.merge import TieredMergeConfig, maybe_merge
from ..index.writer import IndexWriter

__all__ = ["stream_index", "committed_batches"]


def _batches_file(index_dir: str) -> str:
    return os.path.join(index_dir, "_catalog", "batches.json")


def committed_batches(index_dir: str) -> dict:
    path = _batches_file(index_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _record_batch(index_dir: str, batch_id: int, snapshot: int) -> None:
    batches = committed_batches(index_dir)
    batches[str(batch_id)] = snapshot
    path = _batches_file(index_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(batches, f)
    os.rename(tmp, path)


def stream_index(spark: SparkSession, stream_df: DataFrame, key_col: str,
                 text_col: str, index_dir: str, *,
                 checkpoint_dir: str,
                 analyzer: Analyzer = STANDARD,
                 docs_per_segment: int = 4096,
                 term_shards: int = 32,
                 int_keys: bool = False,
                 merge_every_batches: int = 0,
                 merge_cfg: TieredMergeConfig = TieredMergeConfig(),
                 trigger_available_now: bool = True):
    """Start a streaming query that indexes stream_df incrementally.

    Returns the StreamingQuery; callers typically `.awaitTermination()` or
    `.processAllAvailable()`. Readers refresh by constructing a new
    IndexSearcher (snapshot isolation makes this safe mid-stream)."""
    writer = IndexWriter(
        spark, index_dir, analyzer=analyzer,
        docs_per_segment=docs_per_segment, term_shards=term_shards,
        int_keys=int_keys)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if str(batch_id) in committed_batches(index_dir):
            return  # replayed after restart — wave already committed
        writer.add_documents(batch_df, key_col, text_col)
        _record_batch(index_dir, int(batch_id), writer.cat.head())
        if merge_every_batches and (batch_id + 1) % merge_every_batches == 0:
            maybe_merge(spark, index_dir, merge_cfg)

    ws = (stream_df.writeStream
          .foreachBatch(process_batch)
          .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        ws = ws.trigger(availableNow=True)
    return ws.start()

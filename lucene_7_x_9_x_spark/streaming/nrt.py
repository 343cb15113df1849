"""NRT / streaming ingestion: Structured Streaming -> segment waves.

Lucene's streaming story is near-real-time refresh: buffered docs flush as new
segments, readers reopen to see them (DirectoryReader.java:96 open(IndexWriter),
demo LuceneDemo8.6.0/.../MergeDuringRefreshTest.java). SURVEY §2.6 maps this to
incremental batch appends; this module is the Structured Streaming wrapper:
each micro-batch becomes one wave of new segments via IndexWriter.add_documents
(foreachBatch), and every snapshot commit is a refresh point — an IndexSearcher
constructed after the commit sees the new docs.

Exactly-once: foreachBatch may replay a batch after a restart, so the batch id
is recorded INSIDE the snapshot commit itself (IndexCatalog.commit
extra={"batch_id": n} → snap["committed_batches"]) — one atomic rename covers
both the wave publish and the batch record. A replayed batch either finds its
id in the committed map of the head snapshot (skipped) or the crash happened
before the publish (the wave is invisible, redo is safe).

Scale notes: one micro-batch = one wave = O(batch/docs_per_segment) new
segments; maybe_merge() (optionally run every N batches) keeps the segment
count logarithmic exactly like Lucene's background TieredMergePolicy loop.
"""

from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession

from ..analysis.tokenizer import Analyzer, STANDARD
from ..index.catalog import IndexCatalog
from ..index.merge import TieredMergeConfig, maybe_merge
from ..index.writer import IndexWriter

__all__ = ["stream_index", "committed_batches"]


def committed_batches(index_dir: str) -> dict:
    """{batch_id(str): snapshot_id} as visible from the HEAD snapshot — the
    record travels with the commit, so rollback also rolls back batch ids."""
    snap = IndexCatalog(index_dir).snapshot()
    return dict((snap or {}).get("committed_batches", {}))


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
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if str(batch_id) in committed_batches(index_dir):
            return  # replayed after restart — wave already committed
        # write.lock is scoped to the micro-batch: each batch is one atomic
        # writer session (open -> add wave -> commit -> close), so a later
        # stream over the same index — or a manual IndexWriter between
        # batches — never collides with an idle stream's held lock, while
        # two batches mutating concurrently are still refused
        with IndexWriter(
                spark, index_dir, analyzer=analyzer,
                docs_per_segment=docs_per_segment, term_shards=term_shards,
                int_keys=int_keys) as writer:
            writer.add_documents(batch_df, key_col, text_col,
                                 commit_extra={"batch_id": int(batch_id)})
        if merge_every_batches and (batch_id + 1) % merge_every_batches == 0:
            maybe_merge(spark, index_dir, merge_cfg)

    ws = (stream_df.writeStream
          .foreachBatch(process_batch)
          .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        ws = ws.trigger(availableNow=True)
    return ws.start()

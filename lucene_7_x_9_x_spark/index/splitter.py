"""PKIndexSplitter: split an index in two by a query, without re-indexing.

Reference behavior: lucene/misc/.../index/PKIndexSplitter.java — "Split an
index based on a Query" into two target directories: one holding the docs
the query matches, one holding the rest. Lucene implements it as a
file-level copy of every segment plus complementary liveDocs
(DocumentFilteredLeafIndexReader wraps each leaf with the filter as its
live-docs bitset); docids, norms, and postings are untouched.

Spark-first: the copy IS the engine's file-level addIndexes import (one
atomic commit per side, renumbered segments, no re-encoding), and the
complementary liveDocs are one delete generation per side, resolved
DISTRIBUTED through the searcher's match plan. No per-doc driver work; the
whole split is two manifest-scale copies + two match resolutions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..search import query as Q
from .catalog import IndexCatalog
from .writer import IndexWriter


def split_index(spark: SparkSession, source_dir: str,
                passing_dir: str, failing_dir: str, query,
                docs_per_segment: int = 4096) -> tuple[int, int]:
    """Split ``source_dir`` by ``query`` into two NEW index dirs.

    ``passing_dir`` keeps exactly the docs matching ``query`` live;
    ``failing_dir`` keeps the complement. Both sides share the source's
    segment geometry (PKIndexSplitter semantics: deletes, not rewrites —
    run force_merge on a side to physically drop its dead docs). Source
    must have no deletes (the addIndexes import contract, matching
    PKIndexSplitter's createIndex on a fresh Directory). Returns the live
    doc counts (passing, failing).
    """
    if IndexCatalog(passing_dir).head() >= 0:
        raise ValueError(f"index already exists at {passing_dir}")
    if IndexCatalog(failing_dir).head() >= 0:
        raise ValueError(f"index already exists at {failing_dir}")

    complement = Q.BooleanQuery(must=(Q.MatchAllDocsQuery(),),
                                must_not=(query,))
    counts = []
    for dest, kill in ((passing_dir, complement), (failing_dir, query)):
        w = IndexWriter(spark, dest, docs_per_segment=docs_per_segment)
        w.add_indexes(source_dir)
        n_dead = w.delete_documents(kill)
        # numDocs analog: maxDoc - delCount (SegmentCommitInfo.getDelCount)
        counts.append(sum(int(s["max_doc"]) for s in
                          IndexCatalog(dest).live_segments()) - n_dead)
        w.close()
    return counts[0], counts[1]


def multi_pass_split_index(spark: SparkSession, source_dir: str,
                           dest_dirs: list[str], seq: bool = False,
                           docs_per_segment: int = 4096) -> list[int]:
    """MultiPassIndexSplitter analog (lucene/misc/.../index/
    MultiPassIndexSplitter.java split()): split ``source_dir`` into
    ``len(dest_dirs)`` parts by GLOBAL doc number — round-robin
    (doc j lands in part j % numParts) or, with ``seq=True``, contiguous
    ranges of length maxDoc // numParts with the last part collecting the
    rounding tail. The reference deletes every out-of-part doc through a
    FakeDeleteIndexReader and addIndexes the result; here each part is the
    same file-level addIndexes import plus ONE delete generation whose
    targets resolve distributed from a broadcast (segment -> docBase) map —
    no per-doc driver work, deletes-not-rewrites.

    Returns the live doc count per part."""
    n = len(dest_dirs)
    if n < 2:
        raise ValueError("Invalid number of outputs.")
    src = sorted(IndexCatalog(source_dir).live_segments(),
                 key=lambda s: s["segment_id"])
    # global docNum = segment docBase + local docid, in segment order
    # (the reader's leaves order — docBase accumulation like BaseCompositeReader)
    bases, acc = [], 0
    for s in src:
        bases.append(acc)
        acc += int(s["max_doc"])
    max_doc = acc
    if max_doc < 2:
        raise ValueError("Not enough documents for splitting")
    part_len = max_doc // n

    counts: list[int] = []
    for i, dest in enumerate(dest_dirs):
        if IndexCatalog(dest).head() >= 0:
            raise ValueError(f"index already exists at {dest}")
        w = IndexWriter(spark, dest, docs_per_segment=docs_per_segment)
        w.add_indexes(source_dir)
        # add_indexes renumbers the source's segments in segment-id order
        # starting at 0, so dest segment k carries src[k]'s docBase
        dst_segs = sorted(IndexCatalog(dest).live_segments(),
                          key=lambda s: s["segment_id"])
        base_df = spark.createDataFrame(
            [(int(d["segment_id"]), int(b))
             for d, b in zip(dst_segs, bases)], "segment_id int, base long")
        docs = w._live_docs().join(F.broadcast(base_df), "segment_id")
        g = F.col("docid").cast("long") + F.col("base")
        if seq:
            lo, hi = part_len * i, part_len * (i + 1)
            keep = (g >= lo) & ((g < hi) if i < n - 1 else F.lit(True))
        else:
            keep = F.pmod(g, F.lit(n)) == i
        n_dead = w._apply_deletes(
            docs.where(~keep).select("segment_id", "docid"))
        counts.append(max_doc - n_dead)
        w.close()
    return counts

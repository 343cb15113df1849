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

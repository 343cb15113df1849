"""Replicator analog (replicator.py) vs the reference module
lucene/replicator: LocalReplicator/IndexRevision publish a commit point,
ReplicationClient copies missing files then flips the revision,
IndexReplicationHandler cleans unreferenced files.

Pins: replica answers queries bit-identically; a second pass is incremental
(already-present segment dirs skipped); deletes/updates replicate through
their generation dirs; merge + prune removes stale partitions; a foreign
index directory is refused."""

import os

import pytest

from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.index.checkindex import check_index
from lucene_7_x_9_x_spark.index.writer import IndexWriter
from lucene_7_x_9_x_spark.replicator import replicate, revision_manifest
from lucene_7_x_9_x_spark.search import query as Q
from lucene_7_x_9_x_spark.search.searcher import IndexSearcher

DOCS = [(i, ("spark table " if i % 3 == 0 else "merge plan ") + f"row{i}")
        for i in range(24)]


@pytest.fixture()
def src(spark, tmp_path):
    d = str(tmp_path / "src")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", d, docs_per_segment=8,
                int_keys=True, term_shards=4)
    return d


def _hits(spark, d, q=Q.TermQuery("spark"), k=10):
    s = IndexSearcher(spark, d)
    return [(r.key, float(r.score))
            for r in s.search(q, k=k).hits.itertuples()]


def test_replica_answers_identically(spark, src, tmp_path):
    dst = str(tmp_path / "rep")
    res = replicate(src, dst)
    assert res["copied"] and not res["skipped"] and not res["up_to_date"]
    assert _hits(spark, dst) == _hits(spark, src)
    assert check_index(spark, dst) == []
    # idempotent: nothing to do on a second pass at the same revision
    res2 = replicate(src, dst)
    assert res2["up_to_date"]


def test_incremental_sync_and_delete_gens(spark, src, tmp_path):
    dst = str(tmp_path / "rep2")
    replicate(src, dst)
    # source moves on: one add wave + one delete generation
    with IndexWriter(spark, src, docs_per_segment=8) as w:
        w.add_documents(spark.createDataFrame(
            [(100, "spark fresh row100")], "doc_id long, text string"),
            "doc_id", "text")
        w.delete_documents_by_keys([0])
    res = replicate(src, dst)
    assert not res["up_to_date"]
    assert any(u.startswith("deletes/") for u in res["copied"])
    # old segment partitions were NOT recopied
    assert res["skipped"]
    assert _hits(spark, dst, k=24) == _hits(spark, src, k=24)
    s = IndexSearcher(spark, dst)
    assert s.count(Q.TermQuery("row100")) == 1
    assert s.count(Q.TermQuery("row0")) == 0  # delete replicated


def test_merge_prune_removes_stale_partitions(spark, src, tmp_path):
    dst = str(tmp_path / "rep3")
    replicate(src, dst)
    with IndexWriter(spark, src, docs_per_segment=8) as w:
        w.delete_documents_by_keys([1, 2])
        w.force_merge(max_segments=1)
    res = replicate(src, dst)
    assert res["pruned"], "old segment partitions must be cleaned"
    for rel in res["pruned"]:
        assert not os.path.isdir(os.path.join(dst, rel))
    assert _hits(spark, dst, k=24) == _hits(spark, src, k=24)
    assert check_index(spark, dst) == []
    # the manifest of the replicated revision is fully present
    for rel in revision_manifest(dst):
        assert os.path.isdir(os.path.join(dst, rel))


def test_refuses_foreign_index(spark, src, tmp_path):
    other = str(tmp_path / "other")
    docs = spark.createDataFrame([(0, "alien corpus")],
                                 "doc_id long, text string")
    build_index(spark, docs, "doc_id", "text", other, int_keys=True,
                term_shards=2)
    with pytest.raises(ValueError):
        replicate(src, other)


def test_disk_usage_live_vs_orphan(spark, src, tmp_path):
    from lucene_7_x_9_x_spark.index.diskusage import disk_usage
    du = disk_usage(src)
    assert du["total"] > 0 and du["live"] > 0
    assert set(du["by_root"]) >= {"docs", "postings"}
    assert du["orphan"] == 0  # fresh build: everything is referenced
    # merging strands the old segment partitions until GC
    with IndexWriter(spark, src, docs_per_segment=8) as w:
        w.force_merge(max_segments=1)
    du2 = disk_usage(src)
    assert du2["orphan"] > 0
    # expiry reclaims them
    from lucene_7_x_9_x_spark.index.catalog import IndexCatalog
    IndexCatalog(src).expire_snapshots(keep_last_n=1)
    du3 = disk_usage(src)
    assert du3["orphan"] < du2["orphan"]
    assert du3["live"] == du2["live"]

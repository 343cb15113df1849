"""Replicator analog (reference module: solr-8.4.0/lucene/replicator —
LocalReplicator/IndexRevision publish a commit point's files,
ReplicationClient.updateNow() copies the files the replica lacks and only
then flips it to the new revision; IndexReplicationHandler cleans files the
new revision no longer references).

Spark-first shape: a "revision" is the engine's committed snapshot (the
catalog JSON — Lucene's SegmentInfos role) and its referenced partition
directories (segment docs/postings/tvd partitions, delete / soft-delete /
dv-update generation dirs, parallel-field sidecars). Replication is a pure
METADATA-DRIVEN file sync — no Spark job, no re-indexing, no docid change:

  1. diff the source revision's directory manifest against the replica,
  2. copy only the missing dirs (segments are immutable once committed, so
     presence == completeness; copies land under a temp name and are
     renamed into place, the same invisible-until-publish discipline the
     builder uses),
  3. atomically publish the source snapshot as the replica's HEAD
     (single rename — readers see the old or the new revision, never a mix),
  4. optionally prune dirs the new revision no longer references
     (IndexReplicationHandler.cleanupOldIndexFiles).

At 100 TB each copy unit is one segment partition — an object-store
manifest copy per segment, embarrassingly parallel and incremental, exactly
the cost Lucene's replicator pays copying segment files per revision.
Replicas are searchable with the ordinary IndexSearcher (same ids, same
scores bit-for-bit) while the source keeps indexing.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from .index.catalog import IndexCatalog

__all__ = ["revision_manifest", "replicate"]

_REPLICA_MARKER = "replica.json"


def revision_manifest(index_dir: str,
                      snapshot_id: int | None = None) -> list[str]:
    """IndexRevision.getSourceFiles analog: the index-relative directories a
    snapshot references (its live segment partitions across every data root
    plus the visible delete/soft-delete/dv generations)."""
    cat = IndexCatalog(index_dir)
    snap = cat.snapshot(snapshot_id)
    if snap is None:
        raise ValueError(f"no committed snapshot under {index_dir}")
    units: list[str] = []
    for s in snap["segments"]:
        for root in ("docs", "postings", "tvd"):
            rel = os.path.join(root, f"wave={s['wave']}",
                               f"segment_id={s['segment_id']}")
            if os.path.isdir(os.path.join(index_dir, rel)):
                units.append(rel)
        pbase = os.path.join(index_dir, "parallel")
        if os.path.isdir(pbase):
            for name in sorted(os.listdir(pbase)):
                rel = os.path.join("parallel", name,
                                   f"segment_id={s['segment_id']}")
                if os.path.isdir(os.path.join(index_dir, rel)):
                    units.append(rel)
    for kind, key in (("deletes", "delete_gens"),
                      ("soft_deletes", "soft_delete_gens"),
                      ("dv_updates", "dv_gens")):
        for g in snap.get(key, []):
            rel = os.path.join(kind, f"gen={int(g)}")
            if os.path.isdir(os.path.join(index_dir, rel)):
                units.append(rel)
    return units


def replicate(src_dir: str, dst_dir: str, prune: bool = True) -> dict:
    """One ReplicationClient.updateNow() pass: sync ``dst_dir`` to
    ``src_dir``'s current committed revision. Incremental and idempotent —
    already-present directories are skipped, a crashed pass leaves only
    invisible temp dirs and the old HEAD, and re-running converges.

    ``dst_dir`` must be empty or a directory previously created by
    replicate (guarded by a marker — replicas are client-managed, exactly
    like ReplicationClient's handler-owned index directory). Returns
    {"snapshot_id", "copied", "skipped", "pruned", "up_to_date"}."""
    scat = IndexCatalog(src_dir)
    sid = scat.head()
    if sid < 0:
        raise ValueError(f"no committed snapshot under {src_dir}")
    dcat = IndexCatalog(dst_dir)
    marker = os.path.join(dcat.catalog_dir, _REPLICA_MARKER)
    if dcat.head() >= 0 and not os.path.exists(marker):
        raise ValueError(
            f"{dst_dir} holds an index not managed by replicate(); refusing "
            "to overwrite it (ReplicationClient owns its directory)")
    snap = scat.snapshot(sid)
    if dcat.head() == sid and dcat.snapshot(sid) == snap:
        return {"snapshot_id": sid, "copied": [], "skipped": [],
                "pruned": [], "up_to_date": True}

    units = revision_manifest(src_dir, sid)
    copied, skipped = [], []
    for rel in units:
        dst_p = os.path.join(dst_dir, rel)
        if os.path.isdir(dst_p):
            skipped.append(rel)  # segments/gens are immutable once committed
            continue
        tmp = dst_p + ".reptmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # debris from a crashed pass
        os.makedirs(os.path.dirname(dst_p), exist_ok=True)
        shutil.copytree(os.path.join(src_dir, rel), tmp)
        os.rename(tmp, dst_p)
        copied.append(rel)

    # small catalog sidecars (fieldinfos/indexoptions/codec...) — everything
    # except snapshots/HEAD/pins, which the replica manages itself
    for f in glob.glob(os.path.join(scat.catalog_dir, "*.json")):
        base = os.path.basename(f)
        if base.startswith("snapshot-") or base == _REPLICA_MARKER:
            continue
        shutil.copy2(f, os.path.join(dcat.catalog_dir, base))

    # publish: snapshot file then HEAD, each an atomic rename (the replica
    # flips revisions only after every referenced file landed — the
    # ReplicationClient contract)
    spath = os.path.join(dcat.catalog_dir, f"snapshot-{sid}.json")
    tmp = spath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(snap, fh, indent=1)
    os.rename(tmp, spath)
    head_tmp = os.path.join(dcat.catalog_dir, "HEAD.tmp")
    with open(head_tmp, "w") as fh:
        fh.write(str(sid))
    os.rename(head_tmp, os.path.join(dcat.catalog_dir, "HEAD"))
    with open(marker, "w") as fh:
        json.dump({"source": os.path.abspath(src_dir),
                   "last_sync_ms": int(time.time() * 1000),
                   "snapshot_id": sid}, fh)

    pruned: list[str] = []
    if prune:
        keep = set(units)
        for root in ("docs", "postings", "tvd", "deletes", "soft_deletes",
                     "dv_updates"):
            rbase = os.path.join(dst_dir, root)
            if not os.path.isdir(rbase):
                continue
            for rel in _leaf_partitions(rbase, dst_dir):
                if rel not in keep:
                    shutil.rmtree(os.path.join(dst_dir, rel),
                                  ignore_errors=True)
                    pruned.append(rel)
    return {"snapshot_id": sid, "copied": copied, "skipped": skipped,
            "pruned": pruned, "up_to_date": False}


def _leaf_partitions(root_abs: str, base: str) -> list[str]:
    """Index-relative leaf partition dirs (wave=*/segment_id=* or gen=*)."""
    out = []
    for dirpath, dirnames, _files in os.walk(root_abs):
        name = os.path.basename(dirpath)
        if name.startswith("segment_id=") or name.startswith("gen="):
            out.append(os.path.relpath(dirpath, base))
            dirnames[:] = []
    return out

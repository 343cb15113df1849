"""Snapshot catalog: atomic publish points for the segment-structured index.

Plays the role of Lucene's commit (IndexWriter commit path, IndexWriter.java:566-568)
and, at production scale, of an Iceberg table commit: a snapshot JSON lists the live
segment set; readers resolve the latest snapshot and see an immutable point-in-time
view (NRT refresh analog, DirectoryReader.java:96). Written via tmp-file + os.rename
for atomicity. In production this maps 1:1 onto Iceberg snapshots; the sandbox has
no Iceberg runtime, so parquet dirs + JSON manifests emulate it behind this module.

Layout under index_dir/:
  docs/seg=K/*.parquet       postings/seg=K/*.parquet
  _catalog/snapshot-N.json   _catalog/HEAD (contains N)
  lineage/*.parquet          (append-only per-stage per-segment rows)
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

__all__ = ["IndexCatalog", "append_lineage", "read_live_partitions",
           "WriteLock", "LockObtainFailedError"]


class LockObtainFailedError(RuntimeError):
    """A second IndexWriter tried to open the same index
    (o.a.l/store/LockObtainFailedException; IndexWriter.java obtains
    write.lock in its constructor and holds it until close)."""


class WriteLock:
    """NativeFSLockFactory analog (o.a.l/store/NativeFSLockFactory.java; demo
    LuceneDemo/.../io/NativeFSLockFactory.java, LockStree.java): an OS-level
    advisory lock on _catalog/write.lock, obtained with the non-blocking
    equivalent of FileChannel.tryLock. Like the reference's native lock it
    releases automatically when the holding process dies, so a crashed writer
    never wedges the index (the failure mode SimpleFSLockFactory has and
    NativeFSLockFactory was built to avoid).

    Single-host scope, exactly like the reference: on a shared filesystem /
    object store, writer exclusion belongs to the catalog's atomic commit
    (tmp+rename snapshot publish), which this lock complements rather than
    replaces."""

    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "_catalog", "write.lock")
        self._fd: int | None = None

    def acquire(self) -> "WriteLock":
        import fcntl
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            raise LockObtainFailedError(
                f"write.lock held by another IndexWriter: {self.path}")
        os.truncate(fd, 0)
        os.write(fd, f"pid={os.getpid()} ts={time.time()}\n".encode())
        self._fd = fd
        return self

    def release(self) -> None:
        if self._fd is not None:
            import fcntl
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None

    @property
    def held(self) -> bool:
        return self._fd is not None

    def __enter__(self) -> "WriteLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()

    def __del__(self):  # refcount release keeps sequential writers cheap
        try:
            self.release()
        except Exception:
            # interpreter teardown: the fcntl import inside release can fail
            # with "sys.meta_path is None"; the OS drops the flock anyway
            pass


def read_live_partitions(spark, index_dir: str, root: str, segments):
    """Read ONLY the live (wave, segment_id) partitions of `root` by direct
    partition-directory paths (SegmentInfos.files analog: the reader opens
    exactly the files the commit point lists, nothing else).

    This replaces a per-live-segment struct-literal `isin` filter: the listing
    cost is O(#segments) path strings handed to the scan's file index — the
    same cost Lucene pays enumerating segment files — while the QUERY PLAN
    stays O(1), with no giant literal expression for Catalyst to carry through
    optimization at 10^5+ segments. `basePath` keeps wave/segment_id visible
    as partition columns, so downstream partition pruning (term shards,
    per-segment filters) is unchanged. Returns None when nothing is live.
    """
    base = os.path.join(index_dir, root)
    paths = [os.path.join(base, f"wave={s['wave']}",
                          f"segment_id={s['segment_id']}")
             for s in segments]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return None
    return spark.read.option("basePath", base).parquet(*paths)


def append_lineage(index_dir: str, rows: list[tuple]) -> None:
    """Append lineage rows (stage, segment_id, snapshot, rows, wall_ms, status)
    as one parquet file, written driver-side with pyarrow — a Spark job for a
    handful of metadata rows costs ~1s of scheduler latency per wave, which is
    pure serial overhead in the build's critical path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not rows:
        return
    path = os.path.join(index_dir, "lineage")
    os.makedirs(path, exist_ok=True)
    cols = list(zip(*rows))
    table = pa.table({
        "stage": pa.array(cols[0], pa.string()),
        "segment_id": pa.array(cols[1], pa.int32()),
        "snapshot": pa.array(cols[2], pa.int64()),
        "rows": pa.array(cols[3], pa.int64()),
        "wall_ms": pa.array(cols[4], pa.int64()),
        "status": pa.array(cols[5], pa.string()),
    })
    pq.write_table(table, os.path.join(path, f"lineage-{uuid.uuid4().hex}.parquet"))


class IndexCatalog:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.catalog_dir = os.path.join(index_dir, "_catalog")
        os.makedirs(self.catalog_dir, exist_ok=True)

    # --- paths -------------------------------------------------------------
    def docs_path(self, segment_id: int) -> str:
        return os.path.join(self.index_dir, "docs", f"seg={segment_id}")

    def postings_path(self, segment_id: int) -> str:
        return os.path.join(self.index_dir, "postings", f"seg={segment_id}")

    def lineage_path(self) -> str:
        return os.path.join(self.index_dir, "lineage")

    # --- snapshots ----------------------------------------------------------
    def head(self) -> int:
        head_file = os.path.join(self.catalog_dir, "HEAD")
        if not os.path.exists(head_file):
            return -1
        with open(head_file) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: Optional[int] = None) -> Optional[dict]:
        sid = self.head() if snapshot_id is None else snapshot_id
        if sid < 0:
            return None
        path = os.path.join(self.catalog_dir, f"snapshot-{sid}.json")
        with open(path) as f:
            return json.load(f)

    def live_segments(self) -> list[dict]:
        snap = self.snapshot()
        return snap["segments"] if snap else []

    def delete_gens(self) -> list[int]:
        """Delete generations visible to the current snapshot (the committed
        .liv set). Generations written by in-flight ops are absent until their
        commit lists them — and a rollback restores the old list."""
        snap = self.snapshot()
        return list(snap.get("delete_gens", [])) if snap else []

    def soft_delete_gens(self) -> list[int]:
        """Soft-delete generations visible to the current snapshot (the
        committed soft-deletes DocValues analog)."""
        snap = self.snapshot()
        return list(snap.get("soft_delete_gens", [])) if snap else []

    def dv_gens(self) -> list[int]:
        """DocValues-update generations visible to the current snapshot (the
        docValuesGen analog of Lucene's in-place field updates,
        SegmentCommitInfo.java docValuesGen / IndexWriter.updateNumericDocValue).
        Uncommitted gens stay invisible; rollback restores the old list."""
        snap = self.snapshot()
        return list(snap.get("dv_gens", [])) if snap else []

    def commit(self, segments: list[dict], operation: str = "append",
               extra: dict | None = None) -> int:
        """Atomically publish a new snapshot with the given live segment set.

        segments: [{"segment_id": int, "doc_count": int, "sum_ttf": int,
                    "max_doc": int, "size_bytes": int, "merged_from": [int,...]}]
        `extra` keys land in the snapshot JSON (e.g. delete_gens); absent keys
        are inherited from the parent snapshot so commits that don't touch
        deletes carry the visible generation list forward.

        `extra={"batch_id": n}` records streaming batch n as committed IN the
        snapshot itself (snap["committed_batches"][n] = sid): commit and
        batch-record are one atomic rename, so a replayed foreachBatch after a
        crash either sees the batch in the committed map (skip) or the wave was
        never published (safe to redo) — exactly-once either way.
        """
        parent = self.head()
        parent_snap = self.snapshot(parent) if parent >= 0 else None
        sid = parent + 1
        snap = {
            "snapshot_id": sid,
            "parent": parent,
            "operation": operation,
            "ts_ms": int(time.time() * 1000),
            "delete_gens": (parent_snap or {}).get("delete_gens", []),
            "soft_delete_gens": (parent_snap or {}).get(
                "soft_delete_gens", []),
            "dv_gens": (parent_snap or {}).get("dv_gens", []),
            "committed_batches": dict(
                (parent_snap or {}).get("committed_batches", {})),
            "segments": sorted(segments, key=lambda s: s["segment_id"]),
        }
        if extra:
            extra = dict(extra)
            batch_id = extra.pop("batch_id", None)
            if batch_id is not None:
                snap["committed_batches"][str(batch_id)] = sid
            snap.update(extra)
        path = os.path.join(self.catalog_dir, f"snapshot-{sid}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.rename(tmp, path)
        head_tmp = os.path.join(self.catalog_dir, "HEAD.tmp")
        with open(head_tmp, "w") as f:
            f.write(str(sid))
        os.rename(head_tmp, os.path.join(self.catalog_dir, "HEAD"))
        return sid

    def rollback(self, snapshot_id: int) -> int:
        """IndexWriter.rollback analog: move HEAD back to an earlier snapshot.

        Publishes the old segment set as a NEW snapshot (history stays linear
        and append-only — same shape as Iceberg's rollback, which commits a new
        snapshot pointing at old manifests). Data files of rolled-back waves
        simply leave the live set; they are never rewritten."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise ValueError(f"no snapshot {snapshot_id}")
        return self.commit(
            snap["segments"], operation="rollback",
            extra={"delete_gens": snap.get("delete_gens", []),
                   "soft_delete_gens": snap.get("soft_delete_gens", []),
                   "dv_gens": snap.get("dv_gens", []),
                   "rollback_of": snapshot_id})

    # --- deletion policy (IndexDeletionPolicy analog) -------------------------
    def snapshots(self) -> list[int]:
        """All snapshot ids still on disk, ascending (commit-point list)."""
        out = []
        for fn in os.listdir(self.catalog_dir):
            if fn.startswith("snapshot-") and fn.endswith(".json"):
                out.append(int(fn[len("snapshot-"):-len(".json")]))
        return sorted(out)

    def _pins_path(self) -> str:
        return os.path.join(self.catalog_dir, "pins.json")

    def pinned(self) -> set[int]:
        """Snapshot ids protected from expiry (PersistentSnapshotDeletionPolicy
        analog: pins are PERSISTED, so they survive process restarts —
        PersistentSnapshotDeletionPolicyTest.java behavior)."""
        p = self._pins_path()
        if not os.path.exists(p):
            return set()
        with open(p) as f:
            return set(json.load(f))

    def pin_snapshot(self, snapshot_id: int) -> None:
        """SnapshotDeletionPolicy.snapshot(): retain this commit point across
        expiry (the backup/replication handle)."""
        if self.snapshot(snapshot_id) is None:
            raise ValueError(f"no snapshot {snapshot_id}")
        pins = self.pinned() | {int(snapshot_id)}
        tmp = self._pins_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(pins), f)
        os.rename(tmp, self._pins_path())

    def release_snapshot(self, snapshot_id: int) -> None:
        """SnapshotDeletionPolicy.release(): drop the pin; the commit point
        becomes expirable on the next expire_snapshots run."""
        pins = self.pinned() - {int(snapshot_id)}
        tmp = self._pins_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(pins), f)
        os.rename(tmp, self._pins_path())

    def expire_snapshots(self, keep_last_n: int = 1) -> dict:
        """Retention job: keep the newest ``keep_last_n`` snapshots plus HEAD
        and every pinned snapshot; delete the rest and garbage-collect data
        no retained snapshot references (IndexFileDeleter with a
        KeepLastN/SnapshotDeletionPolicy stack; the demo's
        IndexDeletePolicyTest retain-by-policy behavior).

        Sweeps: (wave, segment) partition dirs of docs/postings/tvd orphaned
        by merges and rollbacks, and delete/soft-delete/dv-update generation
        dirs no retained snapshot lists. Without this, the catalog grows
        unboundedly — at the 10^12-doc design point orphaned partitions are
        the dominant storage leak. Metadata-scale driver work: the directory
        listing is O(#segments), the same cost Lucene's IndexFileDeleter pays
        listing the Directory; the data deletes themselves are per-partition
        (object-store manifest drops at production scale).

        Returns {"expired": [...], "kept": [...], "removed_partitions": n,
        "removed_gens": n}."""
        import shutil

        if keep_last_n < 1:
            raise ValueError("keep_last_n must be >= 1")
        head = self.head()
        all_sids = self.snapshots()
        keep = set(all_sids[-keep_last_n:]) | self.pinned()
        if head >= 0:
            keep.add(head)
        expired = [s for s in all_sids if s not in keep]

        live_pairs: set[tuple] = set()
        live_gens = {"deletes": set(), "soft_deletes": set(),
                     "dv_updates": set()}
        for sid in sorted(keep):
            snap = self.snapshot(sid)
            if snap is None:
                continue
            for seg in snap.get("segments", []):
                live_pairs.add((int(seg["wave"]), int(seg["segment_id"])))
            for key, kind in (("delete_gens", "deletes"),
                              ("soft_delete_gens", "soft_deletes"),
                              ("dv_gens", "dv_updates")):
                live_gens[kind].update(int(g) for g in snap.get(key, []))

        removed_parts = 0
        for root in ("docs", "postings", "tvd"):
            rdir = os.path.join(self.index_dir, root)
            if not os.path.isdir(rdir):
                continue
            for wdir in os.listdir(rdir):
                if not wdir.startswith("wave="):
                    continue
                wave = int(wdir.split("=", 1)[1])
                wpath = os.path.join(rdir, wdir)
                for sdir in os.listdir(wpath):
                    if not sdir.startswith("segment_id="):
                        continue
                    seg = int(sdir.split("=", 1)[1])
                    if (wave, seg) not in live_pairs:
                        shutil.rmtree(os.path.join(wpath, sdir))
                        removed_parts += 1
                if not any(e.startswith("segment_id=")
                           for e in os.listdir(wpath)):
                    shutil.rmtree(wpath)

        # gens referenced by NO retained snapshot drop whole; inside retained
        # gens, partitions of segments no retained snapshot keeps alive drop
        # too (a merge folds them into the new segment, so their rows are
        # unreadable dead weight — IndexFileDeleter dropping the old .liv)
        live_seg_ids = {seg for _, seg in live_pairs}
        removed_gens = 0
        for kind, live in live_gens.items():
            kdir = os.path.join(self.index_dir, kind)
            if not os.path.isdir(kdir):
                continue
            for gdir in os.listdir(kdir):
                if not gdir.startswith("gen="):
                    continue
                gpath = os.path.join(kdir, gdir)
                if int(gdir.split("=", 1)[1]) not in live:
                    shutil.rmtree(gpath)
                    removed_gens += 1
                    continue
                for sdir in os.listdir(gpath):
                    if (sdir.startswith("segment_id=")
                            and int(sdir.split("=", 1)[1])
                            not in live_seg_ids):
                        shutil.rmtree(os.path.join(gpath, sdir))
                        removed_gens += 1
                if not any(e.startswith("segment_id=")
                           for e in os.listdir(gpath)):
                    shutil.rmtree(gpath)

        for sid in expired:
            os.remove(os.path.join(self.catalog_dir, f"snapshot-{sid}.json"))
        append_lineage(self.index_dir, [
            ("expire_snapshot", -1, sid, 0, 0, "done") for sid in expired])
        return {"expired": expired, "kept": sorted(keep),
                "removed_partitions": removed_parts,
                "removed_gens": removed_gens}

    def segment_complete(self, segment_id: int) -> bool:
        """A segment's data is durable iff its _SUCCESS markers exist (resume check)."""
        return all(
            os.path.exists(os.path.join(p, "_SUCCESS"))
            for p in (self.docs_path(segment_id), self.postings_path(segment_id))
        )

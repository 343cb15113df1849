"""Index disk-usage diagnostic.

Reference behavior: the luke/misc IndexDiskUsage tool (lucene 9.x
misc/index/IndexDiskUsage.java; in 8.4 the same numbers come from
SegmentInfos.files + Directory.fileLength enumeration) — attribute on-disk
bytes to index structures so operators can see what a field/feature costs.

Here the structures are the engine's data roots (docs / postings / tvd /
deletes / soft_deletes / dv_updates / parallel / lineage / _catalog) and the
unit is a partition directory. Pure driver-side metadata walk — no Spark
job; at object-store scale this is one LIST per root, the same cost Lucene
pays listing its Directory.

Also splits LIVE bytes (referenced by the current snapshot, via the same
manifest the replicator syncs) from ORPHAN bytes (crashed builds, expired
snapshots not yet GC'd) — the number `catalog.expire_snapshots` reclaims.
"""

from __future__ import annotations

import os

from ..replicator import revision_manifest
from .catalog import IndexCatalog

__all__ = ["disk_usage"]

_DATA_ROOTS = ("docs", "postings", "tvd", "deletes", "soft_deletes",
               "dv_updates", "parallel", "lineage", "_catalog")


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def disk_usage(index_dir: str) -> dict:
    """Per-root byte totals plus live/orphan attribution.

    Returns {"total": int, "by_root": {root: bytes}, "live": int,
    "orphan": int, "live_units": {rel_dir: bytes}} — `orphan` is what a GC
    pass (expire_snapshots) would reclaim."""
    by_root = {}
    for root in _DATA_ROOTS:
        p = os.path.join(index_dir, root)
        if os.path.isdir(p):
            by_root[root] = _dir_bytes(p)
    total = sum(by_root.values())

    live_units: dict[str, int] = {}
    live = 0
    keep_units = set()
    if IndexCatalog(index_dir).head() >= 0:
        keep_units = set(revision_manifest(index_dir))
        for rel in keep_units:
            b = _dir_bytes(os.path.join(index_dir, rel))
            live_units[rel] = b
            live += b
    # orphan = leaf PARTITION dirs not referenced by the snapshot (what
    # expire_snapshots reclaims); root-level commit markers (_SUCCESS/.crc)
    # and catalog/lineage bookkeeping are neither live data nor reclaimable
    from ..replicator import _leaf_partitions
    orphan = 0
    for root in ("docs", "postings", "tvd", "deletes", "soft_deletes",
                 "dv_updates"):
        rbase = os.path.join(index_dir, root)
        if not os.path.isdir(rbase):
            continue
        for rel in _leaf_partitions(rbase, index_dir):
            if rel not in keep_units:
                orphan += _dir_bytes(os.path.join(index_dir, rel))
    return {"total": total, "by_root": by_root, "live": live,
            "orphan": orphan, "live_units": live_units}

"""LakeTable maintenance: small-file compaction and snapshot expiry.

Copy-on-write MERGE keeps bucket file counts bounded per commit, but a
long replay accumulates history rows and (on mostly-append workloads)
many small files per bucket. Compaction rewrites chosen buckets into one
file each — through the same atomic commit path, so readers never see a
half-compacted table and time travel to pre-compaction snapshots still
works until they are expired.
"""

from __future__ import annotations

import os
import time

from tpc_di_spark.lake.table import LakeTable, _atomic_write


def compact(
    table: LakeTable,
    max_files_per_bucket: int = 4,
    buckets: list[int] | None = None,
) -> dict:
    """Rewrite every bucket holding more than ``max_files_per_bucket``
    files (or an explicit bucket list) into freshly clustered files."""
    snap = table.snapshot
    targets = (
        [str(b) for b in buckets]
        if buckets is not None
        else [b for b, fl in snap.files.items() if len(fl) > max_files_per_bucket]
    )
    if not targets:
        return {"compacted_buckets": 0, "files_before": 0, "files_after": 0}
    files_before = sum(len(snap.files[b]) for b in targets)
    df = table.with_bucket(table.read(buckets=targets))
    tag = f"compact-{snap.snapshot_id:08d}-{int(time.time())}"
    new_files = table.write_data_files(df, tag)
    table.commit(
        new_files_by_bucket=new_files,
        mode="replace",
        replaced_buckets=targets,
        summary={"operation": "compact", "buckets": len(targets)},
    )
    files_after = sum(len(fl) for fl in new_files.values())
    return {
        "compacted_buckets": len(targets),
        "files_before": files_before,
        "files_after": files_after,
    }


def expire_snapshots(table: LakeTable, keep_last: int = 2) -> dict:
    """Drop snapshot metadata older than the last ``keep_last`` and delete
    data files no snapshot references anymore (orphans from compaction /
    replaced buckets). The current snapshot is never touched.

    Refreshes the handle first: the keep set must derive from the on-disk
    current snapshot, or a stale handle would treat files referenced only
    by newer snapshots (including the actual current one) as orphans and
    permanently delete live data."""
    table.refresh()
    history = table.history()
    keep_ids = {h["snapshot_id"] for h in history[-keep_last:]}
    keep_ids.add(table.snapshot.snapshot_id)

    live: set[str] = set()
    for sid in keep_ids:
        s = table.read_snapshot(sid)
        for fl in s.files.values():
            live.update(fl)
        # Pending merge-on-read delta files are referenced from snapshot
        # properties, not the base file map — they are live too.
        for b in s.properties.get("delta_batches", []):
            for fl in b["files"].values():
                live.update(fl)

    # Optimistic guard mirroring commit/_flip_version: if another writer
    # committed between the refresh above and now, abort rather than delete
    # files a newer snapshot references.
    current = table._read_current_snapshot(table.path, table.fs)
    if current.snapshot_id != table.snapshot.snapshot_id:
        return {"removed_files": 0, "removed_snapshots": 0, "aborted": "concurrent-commit"}

    data_root = os.path.join(table.path, "data")
    removed_files = 0
    for fpath in table.fs.walk_files(data_root):
        if not fpath.endswith(".parquet"):
            continue
        rel = os.path.relpath(fpath, table.path)
        if rel not in live:
            table.fs.remove(fpath)
            removed_files += 1

    removed_snaps = 0
    meta = os.path.join(table.path, "_meta")
    for h in history:
        sid = h["snapshot_id"]
        if sid not in keep_ids:
            p = os.path.join(meta, LakeTable._snap_name(sid))
            if table.fs.exists(p):
                table.fs.remove(p)
                removed_snaps += 1
    return {"removed_files": removed_files, "removed_snapshots": removed_snaps}

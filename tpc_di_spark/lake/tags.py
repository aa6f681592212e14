"""Named snapshot TAGS — immutable refs that pin history for audits.

Iceberg's tag refs (`ALTER TABLE ... CREATE TAG`): a tag is a named,
immutable pointer to one snapshot id, stored at ``_meta/tags/<name>``.
Two jobs tags do that snapshot ids alone cannot:

- **Retention root**: ``lake.maintenance.expire_snapshots`` keeps every
  tagged snapshot (and transitively its data files, history manifests
  and Bloom sidecars) regardless of ``keep_last`` — "pin the quarter-end
  state for the audit" without disabling expiry, the same rule it
  already applies to catalog pins and WAP branch forks.
- **Stable read handle**: ``table.read(snapshot=snapshot_of_tag(table,
  name))`` gives different consumers one agreed-on state by name, where
  raw ids are an implementation detail (the reference has no analogue —
  its Redshift tables are overwritten in place, `Incremental1/
  IncrementalTrade.py` et al.).

Creation is a create-only PUT (``TableFS.create_text`` — If-None-Match
on object stores, hardlink-create locally), so duelling taggers resolve
to one winner and a tag can never be silently repointed: immutability is
structural, not conventional. Re-tagging a name requires an explicit
``delete_tag`` first — and that ordering is visible in the store.
"""

from __future__ import annotations

import json
import os
import re
import time

from tpc_di_spark.lake.table import LakeTable, Snapshot

_TAGS_DIR = os.path.join("_meta", "tags")
_NAME_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]{0,127}")


def _tags_root(table: LakeTable) -> str:
    return os.path.join(table.path, _TAGS_DIR)


def _tag_path(table: LakeTable, name: str) -> str:
    if not _NAME_RE.fullmatch(name):
        raise ValueError(
            f"invalid tag name {name!r}: [A-Za-z0-9][A-Za-z0-9._-]*, max 128"
        )
    return os.path.join(_tags_root(table), name)


def create_tag(table: LakeTable, name: str, snapshot_id: int | None = None) -> dict:
    """Tag ``snapshot_id`` (default: the current snapshot). Create-only:
    raises ``CasConflict`` if the name exists (no silent repoint)."""
    sid = table.snapshot.snapshot_id if snapshot_id is None else snapshot_id
    # Fail fast on a dangling target (expired or never-existed id).
    meta = os.path.join(table.path, "_meta")
    if not table.fs.exists(os.path.join(meta, LakeTable._snap_name(sid))):
        raise ValueError(f"snapshot {sid} is not on disk; cannot tag it")
    ref = {"snapshot_id": sid, "created_at": round(time.time(), 3)}
    table.fs.makedirs(_tags_root(table))
    table.fs.create_text(_tag_path(table, name), json.dumps(ref))
    return ref


def read_tag(table: LakeTable, name: str) -> dict:
    return json.loads(table.fs.read_text(_tag_path(table, name)))


def snapshot_of_tag(table: LakeTable, name: str) -> Snapshot:
    """The tagged snapshot, hydrated for ``table.read(snapshot=...)``."""
    return table.read_snapshot(read_tag(table, name)["snapshot_id"])


def list_tags(table: LakeTable) -> dict[str, dict]:
    root = _tags_root(table)
    if not table.fs.exists(root):
        return {}
    return {name: read_tag(table, name) for name in sorted(table.fs.listdir(root))}


def delete_tag(table: LakeTable, name: str) -> None:
    table.fs.remove(_tag_path(table, name))


def tagged_snapshot_ids(table: LakeTable) -> set[int]:
    """Retention roots for ``expire_snapshots``."""
    return {ref["snapshot_id"] for ref in list_tags(table).values()}

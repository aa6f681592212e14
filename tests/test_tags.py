"""Snapshot tags (lake/tags.py): immutable named refs that pin history
through expire_snapshots — the audit-pin retention rule."""

import pytest

from tpc_di_spark.lake import LakeTable
from tpc_di_spark.lake.fs import CasConflict
from tpc_di_spark.lake.maintenance import expire_snapshots
from tpc_di_spark.lake.tags import (
    create_tag,
    delete_tag,
    list_tags,
    read_tag,
    snapshot_of_tag,
)

from tests.test_lake import SCHEMA, mkrows


def test_tag_create_read_list_delete(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 30))
    ref = create_tag(t, "audit-q1")
    assert ref["snapshot_id"] == t.snapshot.snapshot_id
    t.append(mkrows(spark, 20, text="later"))
    # tag still resolves the OLD state by name
    assert t.read(snapshot=snapshot_of_tag(t, "audit-q1")).count() == 30
    assert list(list_tags(t)) == ["audit-q1"]
    # immutable: re-creating the same name is a structural conflict
    with pytest.raises(CasConflict):
        create_tag(t, "audit-q1")
    # invalid names and dangling targets are refused
    with pytest.raises(ValueError):
        create_tag(t, "bad/name")
    with pytest.raises(ValueError):
        create_tag(t, "dangling", snapshot_id=999)
    delete_tag(t, "audit-q1")
    assert list_tags(t) == {}


def test_tagged_snapshot_survives_expiry(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 30))
    pinned = t.snapshot.snapshot_id
    create_tag(t, "pin", snapshot_id=pinned)
    for i in range(4):
        # full rewrite: without the tag, the pinned snapshot's files
        # would be orphans after expiry
        files = t.write_data_files(
            t.with_bucket(mkrows(spark, 10, text=f"v{i}")), f"rw-{i}"
        )
        t.commit(
            files,
            mode="replace",
            replaced_buckets=list(range(4)),
            summary={"operation": "test-rewrite"},
        )
    rec = expire_snapshots(t, keep_last=1)
    assert rec["removed_snapshots"] > 0
    # the pinned snapshot and its data files are intact and readable
    assert t.read(snapshot=snapshot_of_tag(t, "pin")).count() == 30
    # untag → the next expiry may reclaim it
    delete_tag(t, "pin")
    expire_snapshots(t, keep_last=1)
    with pytest.raises((FileNotFoundError, OSError)):
        t.read_snapshot(pinned)


def test_table_stats_surface(spark, tmp_path):
    from tpc_di_spark.lake.maintenance import table_stats

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, num_buckets=4,
        properties={"index.bloom.column": "conv_id"},
    )
    t.append(mkrows(spark, 40), batch_id=1)
    create_tag(t, "pin")
    s = table_stats(t)
    assert s["num_buckets"] == 4 and s["columns"] == len(SCHEMA.fields)
    assert s["committed_batches"] == 1
    assert s["current_files"] > 0 and s["hist_files"] == 0
    assert s["files_per_bucket"]["max"] >= s["files_per_bucket"]["min"] > 0
    assert s["bloom_indexed_column"] == "conv_id" and s["bloom_sidecars"] >= 1
    assert s["tags"] == ["pin"] and s["branches"] == []
    assert s["pending_mor_deltas"] == []
    assert s["snapshots_on_disk"] >= 2

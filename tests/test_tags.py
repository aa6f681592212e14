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


def test_rollback_to_restores_state_and_batch_ids(spark, tmp_path):
    """Rollback reproduces the old state atomically; rolled-back batch
    ids can re-apply (corrected data); consumers whose state includes
    rolled-back effects refuse with a rebuild instruction."""
    import datetime as dt

    from tpc_di_spark.cdc import CdcOrchestrator, current_state
    from tpc_di_spark.cdc.generator import historical_batch
    from tpc_di_spark.cdc.orchestrator import bootstrap_table
    from tpc_di_spark.lake.incremental_view import IncrementalView
    from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    orch = CdcOrchestrator(table)
    orch.apply_batch(historical_batch(spark, 20, 4), 1)
    good_sid = table.snapshot.snapshot_id
    n_good = current_state(table).count()

    bad = spark.createDataFrame(
        [("U", 5_000, "conv-000001", 1, "user", "POISONED", dt.datetime(2024, 2, 1))],
        "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, "
        "role string, text string, ts timestamp",
    )
    orch.apply_batch(bad, 2)
    assert current_state(table).filter("text = 'POISONED'").count() == 1

    view = IncrementalView(
        table, str(tmp_path / "v"), ["role"], [("count_live", None, "live_turns")]
    )
    view.refresh()  # consumed {1, 2}

    snap = table.rollback_to(good_sid)
    assert snap.summary["operation"] == "rollback"
    assert current_state(table).count() == n_good
    assert current_state(table).filter("text = 'POISONED'").count() == 0
    assert not table.is_batch_committed(2)  # the id is free again

    # consumer holds batch-2 effects -> must refuse, not diverge
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rolled back"):
        view.refresh()

    # corrected batch re-applies under the original id
    fixed = spark.createDataFrame(
        [("U", 5_001, "conv-000001", 1, "user", "fixed", dt.datetime(2024, 2, 2))],
        "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, "
        "role string, text string, ts timestamp",
    )
    orch.apply_batch(fixed, 2)
    assert current_state(table).filter("text = 'fixed'").count() == 1

    # ADVICE r06: a consumer that folded the POISONED batch 2 and
    # refreshes only AFTER the re-apply sees consumed ⊆ committed again;
    # the rollback-invalidation log must still make it refuse (skipping
    # batch 2 as already-consumed would silently keep poisoned effects).
    with _pytest.raises(ValueError, match="re-applied|rolled back"):
        view.refresh()

    # A FRESH consumer built after the re-apply folds the corrected
    # lineage and is not haunted by the old invalidation.
    view2 = IncrementalView(
        table, str(tmp_path / "v2"), ["role"], [("count_live", None, "live_turns")]
    )
    view2.refresh()
    total = sum(r["live_turns"] for r in view2.state().collect())
    assert total == current_state(table).count()
    view2.refresh()  # idempotent no-op with the recorded epoch

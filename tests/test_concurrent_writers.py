"""Optimistic concurrency under duelling writers: a CommitConflict
(another driver's commit landing between this apply's snapshot read and
its CAS flip) triggers a bounded discard-and-recompute retry in the CoW
path and a properties-recompute re-CAS in the MoR path — the Iceberg
commit-retry rule, on the LakeTable snapshot log."""

import datetime as dt

import pytest

from tpc_di_spark.cdc import CdcOrchestrator, current_state
from tpc_di_spark.cdc.orchestrator import bootstrap_table
from tpc_di_spark.lake.table import CommitConflict, LakeTable
from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

EV = "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, role string, text string, ts timestamp"
T0 = dt.datetime(2024, 1, 1)

B1 = [
    ("I", 1, "a", 0, "user", "from-writer-A", T0),
    ("I", 2, "b", 0, "user", "only-A", T0),
]
# overlaps key (a,0): whichever batch COMMITS second must win it
B2 = [
    ("U", 3, "a", 0, "user", "from-writer-B", T0 + dt.timedelta(hours=1)),
    ("I", 4, "c", 0, "user", "only-B", T0 + dt.timedelta(hours=1)),
]


def _mk(spark, path, buckets=4):
    table = bootstrap_table(spark, str(path), TRANSCRIPT_SCHEMA, num_buckets=buckets)
    return table, CdcOrchestrator(table, buckets_per_group=buckets)


def _inject_competing_commit(victim_table, fire):
    """Arrange for `fire()` (another writer's commit) to run right before
    the victim's first CAS flip — the classic read-modify-CAS race."""
    orig = victim_table._flip_version
    state = {"armed": True}

    def hooked(snap, expected_parent):
        if state["armed"]:
            state["armed"] = False
            fire()
        return orig(snap, expected_parent)

    victim_table._flip_version = hooked


def test_cow_conflict_recomputes_and_both_batches_land(spark, tmp_path):
    table_a, orch_a = _mk(spark, tmp_path / "t")
    # second driver: an independent handle on the same table path
    table_b = LakeTable.load(spark, str(tmp_path / "t"))
    orch_b = CdcOrchestrator(table_b, buckets_per_group=4)

    _inject_competing_commit(
        table_a, lambda: orch_b.apply_batch(spark.createDataFrame(B2, EV), 2)
    )
    rec = orch_a.apply_batch(spark.createDataFrame(B1, EV), 1)
    assert "skipped" not in rec

    # both writers' batches are in the final state; the conflicted writer
    # (A) recomputed against B's state and committed second, so A's merge
    # saw B's rows — equal to the sequential replay B-then-A.
    control, orch_c = _mk(spark, tmp_path / "control")
    orch_c.apply_batch(spark.createDataFrame(B2, EV), 2)
    orch_c.apply_batch(spark.createDataFrame(B1, EV), 1)
    got = sorted(map(tuple, current_state(table_a.refresh()).collect()))
    want = sorted(map(tuple, current_state(control).collect()))
    assert got == want
    texts = {(r.conv_id, r.turn_idx): r.text for r in current_state(table_a).collect()}
    assert texts[("b", 0)] == "only-A" and texts[("c", 0)] == "only-B"
    # exactly-once survived the retry: both batch ids committed once
    assert table_a.refresh().is_batch_committed(1)
    assert table_a.is_batch_committed(2)


def test_cow_conflict_exhausted_retries_raises(spark, tmp_path):
    table_a, orch_a = _mk(spark, tmp_path / "t")
    table_b = LakeTable.load(spark, str(tmp_path / "t"))
    orch_b = CdcOrchestrator(table_b, buckets_per_group=4)

    # fire a competing commit before EVERY flip attempt -> livelock
    # surfaces as the underlying CommitConflict, not an infinite loop
    bid = {"n": 10}
    orig = table_a._flip_version

    def always_conflict(snap, expected_parent):
        bid["n"] += 1
        orch_b.apply_batch(spark.createDataFrame(B2, EV), bid["n"])
        return orig(snap, expected_parent)

    table_a._flip_version = always_conflict
    with pytest.raises(CommitConflict):
        orch_a.apply_batch(spark.createDataFrame(B1, EV), 1, retries=1)


def test_mor_conflict_recommits_properties(spark, tmp_path):
    from tpc_di_spark.cdc.mor import apply_batch_mor, current_state_mor, pending_delta_batches

    table_a, orch_a = _mk(spark, tmp_path / "t")
    orch_a.apply_batch(spark.createDataFrame(B1, EV), 1)
    table_b = LakeTable.load(spark, str(tmp_path / "t"))
    orch_b = CdcOrchestrator(table_b, buckets_per_group=4)

    # B appends a MoR delta between A's snapshot read and A's delta CAS
    _inject_competing_commit(
        table_a,
        lambda: apply_batch_mor(orch_b, spark.createDataFrame(B2, EV), 2),
    )
    rec = apply_batch_mor(
        orch_a,
        spark.createDataFrame(
            [("U", 5, "b", 0, "user", "A-delta", T0 + dt.timedelta(hours=2))], EV
        ),
        3,
    )
    assert rec.get("skipped") is None
    table_a.refresh()
    # BOTH writers' pending deltas survived the conflicting commits
    assert [d["batch_id"] for d in pending_delta_batches(table_a)] == [2, 3]
    texts = {
        (r.conv_id, r.turn_idx): r.text for r in current_state_mor(table_a).collect()
    }
    assert texts[("a", 0)] == "from-writer-B"
    assert texts[("b", 0)] == "A-delta"
    assert texts[("c", 0)] == "only-B"


def test_mor_same_batch_duel_resolves_to_skip_no_leaks(spark, tmp_path):
    """Two drivers race the SAME MoR batch id (loser wrote its delta
    files first): the winner's deterministic-tag rewrite replaces the
    loser's uncommitted files, the loser's CAS conflict resolves to the
    exactly-once skip, every file the final snapshot references exists on
    disk, and expire_snapshots finds nothing to sweep (no leaks)."""
    from tpc_di_spark.cdc.mor import apply_batch_mor, current_state_mor
    from tpc_di_spark.lake.maintenance import expire_snapshots

    table_a, orch_a = _mk(spark, tmp_path / "t")
    orch_a.apply_batch(spark.createDataFrame(B1, EV), 1)
    table_b = LakeTable.load(spark, str(tmp_path / "t"))
    orch_b = CdcOrchestrator(table_b, buckets_per_group=4)

    _inject_competing_commit(
        table_a,
        lambda: apply_batch_mor(orch_b, spark.createDataFrame(B2, EV), 2),
    )
    rec = apply_batch_mor(orch_a, spark.createDataFrame(B2, EV), 2)
    assert rec == {"batch_id": 2, "skipped": "already-committed"}

    table_a.refresh()
    # winner's referenced delta files all exist (the loser's earlier
    # write did not corrupt them)
    import os

    for b in table_a.snapshot.properties.get("delta_batches", []):
        for fl in b["files"].values():
            for rel in fl:
                assert table_a.fs.exists(os.path.join(table_a.path, rel)), rel
    before = sorted(map(tuple, current_state_mor(table_a).collect()))
    assert expire_snapshots(table_a, keep_last=1)["removed_files"] == 0
    assert sorted(map(tuple, current_state_mor(table_a.refresh()).collect())) == before


def test_mor_same_batch_duel_write_guard_when_winner_committed_first(spark, tmp_path):
    """Reverse interleaving: the winner COMMITS before the loser even
    writes. The loser's deterministic-tag write must NOT rmtree the
    winner's now-referenced files — the clobber guard raises, the loser
    resolves to the exactly-once skip, and the winner's files survive."""
    from tpc_di_spark.cdc.mor import apply_batch_mor, current_state_mor

    table_a, orch_a = _mk(spark, tmp_path / "t")
    orch_a.apply_batch(spark.createDataFrame(B1, EV), 1)
    table_b = LakeTable.load(spark, str(tmp_path / "t"))
    orch_b = CdcOrchestrator(table_b, buckets_per_group=4)

    # winner lands fully first...
    apply_batch_mor(orch_b, spark.createDataFrame(B2, EV), 2)
    want = sorted(map(tuple, current_state_mor(table_a.refresh()).collect()))

    # ...then a stale-handled loser attempts the same batch. Simulate the
    # stale entry check (the loser refreshed BEFORE the winner committed)
    # by forcing is_batch_committed to miss once.
    orig = table_a.is_batch_committed
    state = {"armed": True}

    def stale_once(bid):
        if state["armed"]:
            state["armed"] = False
            return False
        return orig(bid)

    table_a.is_batch_committed = stale_once
    # refresh() may rebuild the handle state but the monkeypatched method
    # persists on the instance; the write-side guard then catches the duel
    rec = apply_batch_mor(orch_a, spark.createDataFrame(B2, EV), 2)
    assert rec == {"batch_id": 2, "skipped": "already-committed"}
    assert sorted(map(tuple, current_state_mor(table_a.refresh()).collect())) == want

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


def test_mor_same_batch_duel_resolves_to_skip_loser_files_swept(spark, tmp_path):
    """Two drivers race the SAME MoR batch id (loser wrote its delta
    files first): writer-salted attempt dirs mean NEITHER side touches
    the other's files; the loser's CAS conflict resolves to the
    exactly-once skip, every file the final snapshot references exists
    on disk, and the loser's unreferenced attempt files are exactly what
    expire_snapshots sweeps — after which the live state is unchanged."""
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
    # write could not have touched them — different salted attempt dirs)
    import os

    for b in table_a.snapshot.properties.get("delta_batches", []):
        for fl in b["files"].values():
            for rel in fl:
                assert table_a.fs.exists(os.path.join(table_a.path, rel)), rel
    before = sorted(map(tuple, current_state_mor(table_a).collect()))
    # the loser's salted-attempt delta files are unreferenced orphans:
    # expiry sweeps them (>0) and the live state is untouched
    assert expire_snapshots(table_a, keep_last=1)["removed_files"] > 0
    assert sorted(map(tuple, current_state_mor(table_a.refresh()).collect())) == before
    # nothing referenced was removed
    for b in table_a.snapshot.properties.get("delta_batches", []):
        for fl in b["files"].values():
            for rel in fl:
                assert table_a.fs.exists(os.path.join(table_a.path, rel)), rel


def test_mor_same_batch_duel_write_guard_when_winner_committed_first(spark, tmp_path):
    """Reverse interleaving: the winner COMMITS before the loser even
    writes. The loser writes its OWN salted attempt dir (the winner's
    referenced files are untouchable by construction), its commit hits
    the exactly-once guard as a no-op, and it reports the skip."""
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
    # persists on the instance; commit()'s exactly-once guard then turns
    # the loser's commit into a no-op, reported as the skip
    rec = apply_batch_mor(orch_a, spark.createDataFrame(B2, EV), 2)
    assert rec == {"batch_id": 2, "skipped": "already-committed"}
    assert sorted(map(tuple, current_state_mor(table_a.refresh()).collect())) == want


def _threaded_duel(spark, path, batches_a, batches_b):
    """Run two orchestrators over the SAME ObjectStoreFS-backed table from
    separate threads — the production duel, real interleavings, no
    injection. Returns (records_a, records_b, table_handle)."""
    import threading

    from tpc_di_spark.lake.fs import ObjectStoreFS

    fs = ObjectStoreFS()
    table = bootstrap_table(spark, str(path), TRANSCRIPT_SCHEMA, num_buckets=4, fs=fs)
    # independent CLIENT handles (separate drivers — each with its own
    # ETag view); the store-side CAS serialization is process-global
    t_a = LakeTable.load(spark, str(path), fs=ObjectStoreFS())
    t_b = LakeTable.load(spark, str(path), fs=ObjectStoreFS())
    orch_a = CdcOrchestrator(t_a, buckets_per_group=4)
    orch_b = CdcOrchestrator(t_b, buckets_per_group=4)
    recs: dict[str, list] = {"a": [], "b": []}
    errs: list[BaseException] = []

    def run(orch, batches, key):
        try:
            for bid, df in batches:
                recs[key].append(orch.apply_batch(df, bid, retries=8))
        except BaseException as e:  # surfaced below — a thread must not die silently
            errs.append(e)

    th_a = threading.Thread(target=run, args=(orch_a, batches_a, "a"))
    th_b = threading.Thread(target=run, args=(orch_b, batches_b, "b"))
    th_a.start(); th_b.start()
    th_a.join(); th_b.join()
    assert not errs, errs
    return recs["a"], recs["b"], LakeTable.load(spark, str(path), fs=fs)


def test_threaded_duel_different_batches_object_store(spark, tmp_path):
    """Two drivers race DIFFERENT batch ids through the real ObjectStoreFS
    CAS concurrently: both land exactly once, and the final state equals
    a sequential replay. Key sets are DISJOINT because cross-batch order
    between concurrent independent writers is not defined — each batch
    merge creates a new version for its keys regardless of arrival order
    (overlapping keys across duelling drivers require a single sequenced
    tail, which is the orchestrator's documented single-writer-per-key
    model)."""
    d1 = [("I", 1, "a", 0, "user", "from-writer-A", T0),
          ("I", 2, "b", 0, "user", "only-A", T0)]
    d2 = [("I", 3, "c", 0, "user", "only-B", T0 + dt.timedelta(hours=1)),
          ("I", 4, "d", 0, "user", "also-B", T0 + dt.timedelta(hours=1))]
    recs_a, recs_b, table = _threaded_duel(
        spark,
        tmp_path / "t",
        [(1, spark.createDataFrame(d1, EV))],
        [(2, spark.createDataFrame(d2, EV))],
    )
    assert all("skipped" not in r for r in recs_a + recs_b)
    assert table.is_batch_committed(1) and table.is_batch_committed(2)

    control, orch_c = _mk(spark, tmp_path / "control")
    orch_c.apply_batch(spark.createDataFrame(d1, EV), 1)
    orch_c.apply_batch(spark.createDataFrame(d2, EV), 2)
    got = sorted(map(tuple, current_state(table).collect()))
    want = sorted(map(tuple, current_state(control).collect()))
    assert got == want


def test_threaded_duel_same_batch_object_store(spark, tmp_path):
    """Two drivers race the SAME batch id concurrently through the real
    ObjectStoreFS CAS: exactly one wins, the other resolves to the
    exactly-once skip (or recomputes into a no-op), every referenced file
    exists, and the state equals a single apply."""
    import os

    df = lambda: spark.createDataFrame(B1, EV)  # noqa: E731
    recs_a, recs_b, table = _threaded_duel(
        spark, tmp_path / "t", [(1, df())], [(1, df())]
    )
    assert table.is_batch_committed(1)
    skips = [r for r in recs_a + recs_b if r.get("skipped")]
    wins = [r for r in recs_a + recs_b if not r.get("skipped")]
    assert len(wins) == 1 and len(skips) == 1, (recs_a, recs_b)

    # winner's referenced files all exist despite the duel
    for fmap in (table.snapshot.files, table.snapshot.hist_files):
        for fl in fmap.values():
            for rel in fl:
                assert table.fs.exists(os.path.join(table.path, rel)), rel

    control, orch_c = _mk(spark, tmp_path / "control")
    orch_c.apply_batch(df(), 1)
    got = sorted(map(tuple, current_state(table).collect()))
    want = sorted(map(tuple, current_state(control).collect()))
    assert got == want

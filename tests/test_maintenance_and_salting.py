import datetime as dt

import pyspark.sql.functions as F

from tests.conftest import assert_pdf_equal
from tpc_di_spark.lake import LakeTable
from tpc_di_spark.lake.maintenance import compact, expire_snapshots
from tpc_di_spark.operators.salting import salted_agg, salted_broadcast_join
from tests.test_lake import SCHEMA, mkrows


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    for i in range(6):
        t.append(mkrows(spark, 20, text=f"gen{i}"))
    before = t.read().orderBy("conv_id", "turn_idx", "text").toPandas()
    stats = compact(t, max_files_per_bucket=2)
    assert stats["compacted_buckets"] > 0
    assert stats["files_after"] < stats["files_before"]
    after = t.read().orderBy("conv_id", "turn_idx", "text").toPandas()
    assert_pdf_equal(before, after, ["conv_id", "turn_idx", "text"])


def test_auto_compact_policy_bounds_file_growth(spark, tmp_path):
    """The orchestrator's opt-in compaction policy: the append-only
    history family adds a file per touched bucket per batch; with the
    policy on, per-bucket file counts stay bounded and the final state +
    full lineage match an uncompacted replay exactly."""
    from tpc_di_spark.cdc import CdcOrchestrator, current_state
    from tpc_di_spark.cdc.generator import historical_batch, incremental_batch
    from tpc_di_spark.cdc.orchestrator import bootstrap_table
    from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

    def replay(path, **kw):
        table = bootstrap_table(spark, str(path), TRANSCRIPT_SCHEMA, num_buckets=4)
        orch = CdcOrchestrator(table, buckets_per_group=4, **kw)
        recs = [orch.apply_batch(historical_batch(spark, 30, 6), 1)]
        for b in range(2, 6):
            recs.append(
                orch.apply_batch(incremental_batch(spark, b, 250, 30, 6, skew=2.0), b)
            )
        return table, recs

    t_plain, _ = replay(tmp_path / "plain")
    t_auto, recs = replay(tmp_path / "auto", auto_compact_files_per_bucket=3)

    snap = t_auto.snapshot
    per_bucket = {
        b: len(snap.files.get(b, [])) + len(snap.hist_files.get(b, []))
        for b in set(snap.files) | set(snap.hist_files)
    }
    assert any("auto_compact" in r for r in recs), "policy fired at least once"
    assert max(per_bucket.values()) <= 4, f"file growth unbounded: {per_bucket}"

    # correctness unchanged: live state AND full lineage identical
    assert_pdf_equal(
        current_state(t_auto).toPandas(),
        current_state(t_plain).toPandas(),
        ["conv_id", "turn_idx"],
    )
    lineage_cols = ["conv_id", "turn_idx", "text", "batch_id", "is_current"]
    a = t_auto.read().select(*lineage_cols).toPandas()
    p = t_plain.read().select(*lineage_cols).toPandas()
    assert_pdf_equal(a, p, ["conv_id", "turn_idx", "batch_id", "text"])


def test_expire_snapshots_removes_orphans(spark, tmp_path):
    import glob

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    for i in range(4):
        t.append(mkrows(spark, 20, text=f"gen{i}"))
    compact(t, max_files_per_bucket=1)
    n_files_before = len(glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    stats = expire_snapshots(t, keep_last=1)
    assert stats["removed_files"] > 0
    n_files_after = len(glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    assert n_files_after < n_files_before
    assert t.read().count() == 80  # current snapshot intact
    assert t.history()[-1]["snapshot_id"] == t.snapshot.snapshot_id


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(500)] + [("cold", i, 1.0) for i in range(5)],
        "conv_id string, turn_idx int, v double",
    )
    out = salted_agg(
        df,
        ["conv_id"],
        {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")},
        salt_from=["turn_idx"],
        buckets=8,
    )
    got = {r.conv_id: (r.n, r.total, r.mx) for r in out.collect()}
    assert got["hot"] == (500, float(sum(range(500))), 499.0)
    assert got["cold"] == (5, 5.0, 1.0)


def test_salted_broadcast_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [("k1", i) for i in range(300)] + [("k2", i) for i in range(3)],
        "key string, payload int",
    )
    dim = spark.createDataFrame(
        [("k1", "dim1"), ("k2", "dim2"), ("k3", "dim3")], "key string, dval string"
    )
    out = salted_broadcast_join(fact, dim, ["key"], buckets=4)
    plain = fact.join(dim, ["key"], "left")
    assert_pdf_equal(
        out.toPandas(), plain.toPandas(), ["key", "payload"]
    )


def test_expire_snapshots_on_stale_handle_keeps_current_data(spark, tmp_path):
    """expire_snapshots must derive the keep set from the ON-DISK current
    snapshot: a stale handle (another writer committed since) would
    otherwise delete data files the real current snapshot references."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 20, text="gen0"))

    stale = LakeTable.load(spark, str(tmp_path / "t"))  # pins snapshot 1
    t.append(mkrows(spark, 20, text="gen1"))
    compact(t, max_files_per_bucket=0)  # rewrites everything -> new files

    expire_snapshots(stale, keep_last=1)
    # The actual current snapshot must still be fully readable.
    assert t.refresh().read().count() == 40


def test_rebucket_changes_layout_atomically(spark, tmp_path):
    from tpc_di_spark.lake.maintenance import rebucket

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 80, text="gen0"))
    before = t.read().orderBy("conv_id", "turn_idx").toPandas()
    old_snap = t.snapshot.snapshot_id

    stats = rebucket(t, 16)
    assert stats["rebucketed"] and t.num_buckets == 16
    after = t.read().orderBy("conv_id", "turn_idx").toPandas()
    assert_pdf_equal(before, after, ["conv_id", "turn_idx"])
    # New assignment is the N'=16 hash; bucket pruning works post-rebucket.
    some = t.read(buckets=range(8)).count()
    rest = t.read(buckets=range(8, 16)).count()
    assert some + rest == 80 and some > 0 and rest > 0
    # Time travel to the pre-rebucket snapshot still reads the old layout.
    old = t.read(snapshot=t.read_snapshot(old_snap)).count()
    assert old == 80
    # Writes after rebucket use the new bucket count.
    t.append(mkrows(spark, 20, text="gen1"))
    assert t.read().count() == 100

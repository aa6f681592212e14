"""Bloom secondary index (lake/bloom.py): build-on-commit, file skipping
for conv_id-only probes, lifecycle under merge/compaction/expiry, and the
absent-means-scan correctness guarantee."""

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tpc_di_spark.lake import LakeTable
from tpc_di_spark.lake import bloom as bl

SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def mkrows(spark, convs, turns, text="v1"):
    return spark.createDataFrame(
        [
            (f"conv-{c:04d}", t, f"{text} c{c} t{t}", dt.datetime(2024, 1, 1, 0, 0, 0))
            for c in convs
            for t in range(turns)
        ],
        SCHEMA,
    )


def make_table(spark, path, **props):
    return LakeTable.create(
        spark,
        str(path),
        SCHEMA,
        num_buckets=8,
        properties={bl.PROP_COLUMN: "conv_id", **props},
    )


def test_sidecar_built_per_commit_and_carried(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.append(mkrows(spark, range(0, 10), 4))
    assert len(t.snapshot.bloom_index) == 1
    covered = set(t.snapshot.bloom_index[0]["files"])
    assert covered == {r for fl in t.snapshot.files.values() for r in fl}
    t.append(mkrows(spark, range(10, 20), 4))
    assert len(t.snapshot.bloom_index) == 2  # old entry carried forward


def test_lookup_by_prunes_files_and_is_exact(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    # Many commits => many files; each conversation's rows land in a few.
    for lo in range(0, 60, 10):
        t.append(mkrows(spark, range(lo, lo + 10), 3))
    total_files = sum(len(fl) for fl in t.snapshot.files.values())
    got = t.lookup_by("conv_id", ["conv-0003", "conv-0042"]).collect()
    assert sorted({r.conv_id for r in got}) == ["conv-0003", "conv-0042"]
    assert len(got) == 6
    st = t.last_lookup_stats
    assert st["files_total"] == total_files
    # 2 conversations live in at most 2 commits' buckets (+ false
    # positives); the probe must skip most of the 6-commit file set.
    assert st["files_scanned"] < total_files / 2


def test_unindexed_table_full_scans_but_answers(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, range(5), 2))
    got = t.lookup_by("conv_id", ["conv-0001"]).collect()
    assert len(got) == 2
    assert t.last_lookup_stats["files_scanned"] == t.last_lookup_stats["files_total"]


def test_probe_different_column_degrades_to_scan(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.append(mkrows(spark, range(5), 2))
    got = t.lookup_by("text", ["v1 c2 t1"]).collect()
    assert len(got) == 1
    assert t.last_lookup_stats["files_scanned"] == t.last_lookup_stats["files_total"]


def test_int_typed_probe_values_hash_correctly(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        num_buckets=4,
        properties={bl.PROP_COLUMN: "turn_idx"},
    )
    t.append(mkrows(spark, range(6), 5))
    got = t.lookup_by("turn_idx", [3]).collect()
    assert len(got) == 6 and all(r.turn_idx == 3 for r in got)


def test_compaction_rebuilds_and_drops_dead_entries(spark, tmp_path):
    from tpc_di_spark.lake.maintenance import compact, expire_snapshots

    t = make_table(spark, tmp_path / "t")
    for lo in range(0, 30, 10):
        t.append(mkrows(spark, range(lo, lo + 10), 2))
    assert len(t.snapshot.bloom_index) == 3
    compact(t, max_files_per_bucket=0)
    # Replaced files' entries died; the compaction commit built one fresh
    # sidecar covering the rewritten files.
    live = {r for fl in t.snapshot.files.values() for r in fl}
    assert {f for e in t.snapshot.bloom_index for f in e["files"]} >= live
    got = t.lookup_by("conv_id", ["conv-0015"]).collect()
    assert len(got) == 2
    # Expiry sweeps sidecars only expired snapshots reference.
    meta_before = [
        n for n in t.fs.listdir(str(tmp_path / "t" / "_meta")) if n.startswith("bloom-")
    ]
    res = expire_snapshots(t, keep_last=1)
    assert res["removed_blooms"] > 0
    live_sidecars = {e["rel"] for e in t.snapshot.bloom_index}
    remaining = [
        n for n in t.fs.listdir(str(tmp_path / "t" / "_meta")) if n.startswith("bloom-")
    ]
    assert {f"_meta/{n}" for n in remaining} == live_sidecars
    assert len(remaining) < len(meta_before)
    # Probe still exact after expiry.
    assert len(t.lookup_by("conv_id", ["conv-0015"]).collect()) == 2


def test_cdc_merge_keeps_index_fresh(spark, tmp_path):
    """Replaced buckets' filters die with their files; the merge commit
    indexes its rewritten files, so post-merge probes see updated text."""
    from tpc_di_spark.cdc.orchestrator import CdcOrchestrator, bootstrap_table
    from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

    t = bootstrap_table(
        spark,
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        num_buckets=8,
        properties={bl.PROP_COLUMN: "conv_id"},
    )
    orch = CdcOrchestrator(t, buckets_per_group=8)

    from pyspark.sql.types import LongType
    from tpc_di_spark.schemas import TRANSCRIPT_DATA_FIELDS

    EV = StructType(
        [
            StructField("cdc_flag", StringType(), False),
            StructField("cdc_dsn", LongType(), False),
            *TRANSCRIPT_DATA_FIELDS,
        ]
    )

    def ev(flag, conv, turn, text, s):
        return (flag, s, conv, turn, "user", text, dt.datetime(2024, 1, 1, 0, 0, s % 60))

    b1 = spark.createDataFrame(
        [ev("I", f"conv-{c:03d}", t_, "orig", c * 10 + t_) for c in range(20) for t_ in range(3)],
        EV,
    )
    orch.apply_batch(b1, batch_id=1)
    b2 = spark.createDataFrame([ev("U", "conv-007", 1, "edited", 999)], EV)
    orch.apply_batch(b2, batch_id=2)
    live = t.lookup_by("conv_id", ["conv-007"]).filter(F.col("is_current")).collect()
    assert sorted((r.turn_idx, r.text) for r in live) == [
        (0, "orig"), (1, "edited"), (2, "orig"),
    ]
    assert t.last_lookup_stats["files_scanned"] < t.last_lookup_stats["files_total"]


def test_rename_of_indexed_column_refused(spark, tmp_path):
    # Index a NON-key column (key columns are already rename-protected).
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        num_buckets=4,
        properties={bl.PROP_COLUMN: "text"},
    )
    t.append(mkrows(spark, range(3), 2))
    with pytest.raises(ValueError, match="Bloom-indexed"):
        t.rename_column("text", "body")


def test_null_probe_refused_and_null_cells_skipped(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    rows = spark.createDataFrame(
        [("x", 0, None, None), ("y", 1, "t", None)], SCHEMA
    )
    t.append(rows)
    with pytest.raises(ValueError, match="NULL"):
        t.lookup_by("conv_id", ["x", None])
    assert len(t.lookup_by("conv_id", ["x"]).collect()) == 1



def test_consolidate_blooms(spark, tmp_path):
    """Many per-commit sidecars merge into one; lookups stay exact and
    prune-effective, and expiry sweeps the superseded sidecars."""
    from tpc_di_spark.lake.maintenance import consolidate_blooms, expire_snapshots

    t = make_table(spark, tmp_path / "t")
    for lo in range(0, 60, 10):
        t.append(mkrows(spark, range(lo, lo + 10), 3))
    n_before = len(t.snapshot.bloom_index)
    assert n_before == 6
    probe = ["conv-0003", "conv-0042"]
    want = {(r.conv_id, r.turn_idx) for r in t.lookup_by("conv_id", probe).collect()}

    rec = consolidate_blooms(t, max_sidecars=1)
    assert rec["sidecars_after"] == 1 and len(t.snapshot.bloom_index) == 1
    got = {(r.conv_id, r.turn_idx) for r in t.lookup_by("conv_id", probe).collect()}
    assert got == want and len(got) == 6
    st = t.last_lookup_stats
    assert st["files_scanned"] < st["files_total"] / 2  # still prunes
    # below threshold: no-op
    assert consolidate_blooms(t, max_sidecars=8)["consolidated"] == 0
    # expiry sweeps the superseded sidecar files; the merged one survives
    swept = expire_snapshots(t, keep_last=1)
    assert swept["removed_blooms"] >= n_before
    assert {(r.conv_id, r.turn_idx) for r in t.lookup_by("conv_id", probe).collect()} == want


def test_auto_consolidation_rides_compaction_policy(spark, tmp_path):
    """An orchestrator with a compaction policy on an indexed table also
    bounds sidecar count — one knob for both growth curves."""
    from tpc_di_spark.cdc import CdcOrchestrator
    from tpc_di_spark.cdc.generator import historical_batch, incremental_batch
    from tpc_di_spark.cdc.orchestrator import bootstrap_table
    from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

    table = bootstrap_table(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4,
        properties={bl.PROP_COLUMN: "conv_id"},
    )
    orch = CdcOrchestrator(table, auto_compact_files_per_bucket=2)
    orch.apply_batch(historical_batch(spark, 30, 4), 1)
    for b in range(2, 8):
        orch.apply_batch(incremental_batch(spark, b, 150, 30, 4), b)
    assert len(table.snapshot.bloom_index) <= 3  # bounded, not ~7
    convs = ["conv-000003", "conv-000011"]
    got = table.lookup_by("conv_id", convs, family="current")
    df = table.read(family="current").filter(F.col("is_current"))
    want = df.filter(df.conv_id.isin(convs)).filter(F.col("is_current"))
    assert got.filter(F.col("is_current")).count() == want.count()


def test_index_column_change_never_wrong(spark, tmp_path):
    """After unsetting and re-pointing index.bloom.column at another
    column, old-column filters must NOT prune probes on the new column
    (a cross-column test would silently drop rows)."""
    t = make_table(spark, tmp_path / "t")
    t.append(mkrows(spark, range(0, 10), 3))
    # repoint the index at `text` (the guard workflow: unset, then set)
    t.set_properties({bl.PROP_COLUMN: "text"})
    t.append(mkrows(spark, range(10, 20), 3, text="special"))
    # probe the NEW column: old-column files have no text filter -> scan
    got = t.lookup_by("text", ["special c15 t1"]).collect()
    assert len(got) == 1 and got[0].conv_id == "conv-0015"
    # probe the OLD column: new-batch files carry text filters only ->
    # they must be scanned, not pruned, for a conv_id probe
    got2 = t.lookup_by("conv_id", ["conv-0015"]).collect()
    assert len(got2) == 3


def test_widening_indexed_column_refused(spark, tmp_path):
    from pyspark.sql.types import LongType

    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        StructType(
            [
                StructField("conv_id", StringType(), False),
                StructField("turn_idx", IntegerType(), False),
                StructField("score", IntegerType(), True),
                StructField("ts", TimestampType(), True),
            ]
        ),
        num_buckets=4,
        properties={bl.PROP_COLUMN: "score"},
    )
    widened = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField("score", LongType(), True),
            StructField("ts", TimestampType(), True),
        ]
    )
    with pytest.raises(ValueError, match="Bloom-indexed column"):
        t.evolve_schema(widened)


def test_probe_loads_sidecars_lazily(spark, tmp_path):
    """VERDICT r06 #2: probe-time driver allocation must be bounded by
    the sidecars a lookup actually consults, not by every covered file —
    constructing the probe reads no sidecar bytes, and a probe decodes
    each consulted sidecar exactly once (memoized)."""
    t = make_table(spark, tmp_path / "t")
    for lo in range(0, 40, 10):
        t.append(mkrows(spark, range(lo, lo + 10), 3))
    n_sidecars = len(t.snapshot.bloom_index)
    assert n_sidecars == 4

    reads: list[str] = []
    orig = t.fs.read_text

    def counting_read(path):
        if "bloom-" in path:
            reads.append(path)
        return orig(path)

    t.fs.read_text = counting_read
    try:
        probe = t._bloom_probe(t.snapshot)
        assert reads == []  # construction is metadata-only
        got = t.lookup_by("conv_id", ["conv-0015"]).collect()
        assert len(got) == 3
        # every consulted sidecar decoded at most once
        assert 0 < len(reads) <= n_sidecars
        assert len(set(reads)) == len(reads)
        n_first = len(reads)
        t.lookup_by("conv_id", ["conv-0015"]).collect()
        assert len(reads) == n_first  # memoized across probes (same snapshot)
    finally:
        t.fs.read_text = orig

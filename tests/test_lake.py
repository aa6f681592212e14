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
from tpc_di_spark.lake.table import CommitConflict

SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def mkrows(spark, n, text="v1"):
    return spark.createDataFrame(
        [(f"c{i % 7}", i, f"{text}-{i}", dt.datetime(2024, 1, 1, 0, 0, i % 60)) for i in range(n)],
        SCHEMA,
    )


def test_create_load_roundtrip(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    assert t.snapshot.snapshot_id == 0
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert t2.schema == SCHEMA
    assert t2.read().count() == 0
    with pytest.raises(FileExistsError):
        LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)


def test_append_and_read(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 50))
    assert t.read().count() == 50
    t.append(mkrows(spark, 10, text="v2"))
    assert t.read().count() == 60


def test_bucket_pruning(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 100))
    full = t.with_bucket(t.read())
    for b in range(4):
        want = full.filter(F.col("_bucket") == b).count()
        got = t.read(buckets=[b]).count()
        assert got == want
    assert sum(t.read(buckets=[b]).count() for b in range(4)) == 100


def test_replace_commit_copy_on_write(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 100))
    before = {b: list(fl) for b, fl in t.snapshot.files.items()}
    # Rewrite bucket 0 only.
    rows = t.with_bucket(t.read(buckets=[0])).withColumn("text", F.lit("rewritten"))
    files = t.write_data_files(rows, "rewrite-b0")
    t.commit(files, mode="replace", replaced_buckets=[0], summary={"operation": "test"})
    after = t.snapshot.files
    assert after["0"] != before["0"]
    for b in ("1", "2", "3"):
        assert after[b] == before[b], "untouched buckets must carry forward by reference"
    assert t.read().count() == 100
    assert t.read(buckets=[0]).filter(F.col("text") == "rewritten").count() == t.read(buckets=[0]).count()


def test_schema_evolution_null_fills(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 20))
    evolved = StructType(SCHEMA.fields + [StructField("tool", StringType(), True)])
    t.evolve_schema(evolved)
    df = t.read()
    assert "tool" in df.columns
    assert df.filter(F.col("tool").isNull()).count() == 20
    with pytest.raises(ValueError):
        t.evolve_schema(StructType(SCHEMA.fields[:2]))  # dropping cols forbidden
    retyped = StructType(
        [StructField("conv_id", IntegerType(), False)] + SCHEMA.fields[1:]
    )
    with pytest.raises(ValueError):
        t.evolve_schema(retyped)


def test_time_travel(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 30))
    snap1 = t.snapshot.snapshot_id
    t.append(mkrows(spark, 20, text="later"))
    assert t.read().count() == 50
    assert t.read(snapshot=t.read_snapshot(snap1)).count() == 30
    assert [h["snapshot_id"] for h in t.history()] == [0, 1, 2]


def test_exactly_once_batch_guard(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, num_buckets=4)
    t.append(mkrows(spark, 10), batch_id=7)
    sid = t.snapshot.snapshot_id
    assert t.is_batch_committed(7)
    files = t.write_data_files(t.with_bucket(mkrows(spark, 10)), "dup-attempt")
    snap = t.commit(files, mode="append", batch_id=7)
    assert snap.snapshot_id == sid, "recommitting batch 7 must be a no-op"
    assert t.read().count() == 10


def test_commit_conflict_detection(spark, tmp_path):
    path = str(tmp_path / "t")
    t1 = LakeTable.create(spark, path, SCHEMA, num_buckets=4)
    t2 = LakeTable.load(spark, path)
    t1.append(mkrows(spark, 5))
    with pytest.raises(CommitConflict):
        t2.append(mkrows(spark, 5))

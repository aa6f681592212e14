"""ANN index freshness under CDC (lake/ivf_sync.IvfIndexSync): the index
follows the embedding table's change stream with O(changed) refresh work,
reports reassignment drift, trips the retrain trigger, and a retrain
re-spaces the index exactly-once."""

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from tpc_di_spark.cdc import CdcOrchestrator
from tpc_di_spark.cdc.apply import current_state
from tpc_di_spark.lake.ivf_sync import IvfIndexSync
from tpc_di_spark.lake.table import LakeTable
from tpc_di_spark.operators.ivf import ivf_assign
from tpc_di_spark.schemas import LINEAGE_FIELDS

EV = "cdc_flag string, cdc_dsn long, vec_id long, embedding array<double>, ts timestamp"
T0 = dt.datetime(2024, 1, 1)
DIM = 4
# Two well-separated hand-placed centroids: drift is then controllable —
# a vector update that flips sign hops cells deterministically.
CENTS = [[1.0] * DIM, [-1.0] * DIM]


def _vec(sign: float, i: int):
    return [sign * (1.0 + 0.01 * i)] * DIM


def _mk(spark, tmp_path):
    parent = LakeTable.create(
        spark, str(tmp_path / "emb"),
        StructType(
            [
                StructField("vec_id", LongType(), False),
                StructField("embedding", ArrayType(DoubleType()), True),
                StructField("ts", TimestampType(), True),
            ]
            + LINEAGE_FIELDS
        ),
        num_buckets=4, key_cols=("vec_id",),
    )
    index = LakeTable.create(
        spark, str(tmp_path / "ivf"),
        StructType(
            [
                StructField("vec_id", LongType(), False),
                StructField("centroid_id", IntegerType(), True),
                StructField("ts", TimestampType(), True),
            ]
            + LINEAGE_FIELDS
        ),
        num_buckets=4, key_cols=("vec_id",),
    )
    orch = CdcOrchestrator(parent, buckets_per_group=4)
    sync = IvfIndexSync(
        parent, index, str(tmp_path / "sync"),
        centroids=CENTS, retrain_threshold=0.25,
    )
    return parent, index, orch, sync


def _index_state(index):
    return {
        r["vec_id"]: r["centroid_id"]
        for r in index.refresh()
        .read(family="current")
        .filter(F.col("is_current"))
        .select("vec_id", "centroid_id")
        .collect()
    }


def _scratch_assign(parent):
    return {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(
            current_state(parent), "vec_id", "embedding", CENTS
        ).select("vec_id", "centroid_id").collect()
    }


def test_refresh_is_o_changed_and_matches_scratch(spark, tmp_path):
    parent, index, orch, sync = _mk(spark, tmp_path)
    b1 = spark.createDataFrame(
        [("I", i, i, _vec(1.0 if i % 2 == 0 else -1.0, i), T0) for i in range(20)],
        EV,
    )
    orch.apply_batch(b1, 1)
    r1 = sync.refresh()
    assert r1["assigned"] == 20 and r1["reassigned"] == 0
    assert _index_state(index) == _scratch_assign(parent)

    # Batch 2 touches only 3 vectors (2 sign flips + 1 benign rescale):
    # the refresh assigns exactly those 3 — O(changed), not O(corpus).
    b2 = spark.createDataFrame(
        [
            ("U", 100, 0, _vec(-1.0, 0), T0 + dt.timedelta(hours=1)),
            ("U", 101, 2, _vec(-1.0, 2), T0 + dt.timedelta(hours=1)),
            ("U", 102, 1, _vec(-2.0, 1), T0 + dt.timedelta(hours=1)),
        ],
        EV,
    )
    orch.apply_batch(b2, 2)
    r2 = sync.refresh()
    assert r2["assigned"] == 3, "refresh must assign only the changed vectors"
    assert r2["reassigned"] == 2  # the two sign flips hopped cells
    assert r2["reassigned_fraction"] == pytest.approx(2 / 3)
    assert r2["retrain_due"] is False  # 2/20 < 0.25
    assert _index_state(index) == _scratch_assign(parent)

    # Idempotent: nothing new committed -> no-op, state unchanged.
    assert sync.refresh()["skipped"] == "up-to-date"


def test_deletes_drop_index_rows(spark, tmp_path):
    parent, index, orch, sync = _mk(spark, tmp_path)
    orch.apply_batch(
        spark.createDataFrame(
            [("I", i, i, _vec(1.0, i), T0) for i in range(10)], EV
        ),
        1,
    )
    sync.refresh()
    orch.apply_batch(
        spark.createDataFrame(
            [("D", 100 + i, i, None, T0 + dt.timedelta(hours=1)) for i in (3, 7)],
            EV,
        ),
        2,
    )
    r = sync.refresh()
    assert r["assigned"] == 0
    st = _index_state(index)
    assert set(st) == set(range(10)) - {3, 7}
    assert st == _scratch_assign(parent)


def test_drift_trips_retrain_and_retrain_respaces(spark, tmp_path):
    parent, index, orch, sync = _mk(spark, tmp_path)
    orch.apply_batch(
        spark.createDataFrame(
            [("I", i, i, _vec(1.0, i), T0) for i in range(8)], EV
        ),
        1,
    )
    sync.refresh()
    # Flip half the corpus across the cell boundary: drift 4/8 >= 0.25.
    orch.apply_batch(
        spark.createDataFrame(
            [("U", 100 + i, i, _vec(-1.0, i), T0 + dt.timedelta(hours=1))
             for i in range(4)],
            EV,
        ),
        2,
    )
    r = sync.refresh()
    assert r["reassigned"] == 4 and r["retrain_due"] is True
    assert _index_state(index) == _scratch_assign(parent)

    # Retrain with NEW centroids: full re-assignment under the new space,
    # exactly-once, centroid pin replaced, drift counter reset.
    new_cents = [[0.5] * DIM, [-0.5] * DIM]
    rec = sync.retrain(batch_id=1_000, centroids=new_cents)
    assert rec["retrained"] and rec["apply"].get("skipped") is None
    got = _index_state(index)
    want = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(
            current_state(parent), "vec_id", "embedding", new_cents
        ).select("vec_id", "centroid_id").collect()
    }
    assert got == want
    import json

    ck = json.loads(parent.fs.read_text(os.path.join(sync.state_dir, "_ckpt.json")))
    assert ck["moved_since_retrain"] == 0
    pin = json.loads(parent.fs.read_text(os.path.join(sync.state_dir, "centroids.json")))
    assert pin["centroids"] == new_cents

    # A restarted sync picks up the PINNED space (argument ignored).
    sync2 = IvfIndexSync(parent, index, str(tmp_path / "sync"), centroids=CENTS)
    assert sync2.centroids == new_cents


def test_retrain_deletes_stale_keys(spark, tmp_path):
    parent, index, orch, sync = _mk(spark, tmp_path)
    orch.apply_batch(
        spark.createDataFrame(
            [("I", i, i, _vec(1.0, i), T0) for i in range(6)], EV
        ),
        1,
    )
    sync.refresh()
    # Parent deletes vec 5 but the sync has NOT consumed that batch when
    # retrain runs — retrain reconciles the index against the live corpus
    # directly, so the stale index row must go.
    orch.apply_batch(
        spark.createDataFrame([("D", 100, 5, None, T0 + dt.timedelta(hours=1))], EV),
        2,
    )
    sync.retrain(batch_id=1_000, centroids=CENTS)
    assert set(_index_state(index)) == set(range(5))

"""Out-of-order tail repair: a MISSED batch redelivered after
higher-numbered batches committed (``CdcOrchestrator.apply_late_batch``).

The contract: final CURRENT state is independent of arrival order — the
late apply's supersession anti-join (keys changed by batches > the late
id drop; the rest merge normally) reproduces serial batch-id-order
replay row-for-row. The reference has no analogue (Step Functions
serializes batches, report §4.2); a real WAL consumer with a stalled
partition needs exactly this.
"""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from tests.conftest import assert_pdf_equal
from tpc_di_spark.cdc import CdcOrchestrator, current_state
from tpc_di_spark.cdc.generator import historical_batch, incremental_batch
from tpc_di_spark.cdc.orchestrator import bootstrap_table
from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

N_CONVS = 12
TURNS = 6
KEY = ["conv_id", "turn_idx"]

EV_DDL = (
    "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, "
    "role string, text string, ts timestamp"
)


def gen_batches(spark):
    """Batches 1..4: historical + three incremental, plus crafted rows in
    batch 3 whose keys batch 4 supersedes (update-over-late and
    tombstone-over-late)."""
    b1 = historical_batch(spark, N_CONVS, TURNS)
    b2 = incremental_batch(spark, 2, 80, N_CONVS, TURNS, p_delete=0.2)
    b3 = incremental_batch(spark, 3, 80, N_CONVS, TURNS, p_delete=0.2).union(
        spark.createDataFrame(
            [
                # batch 4 rewrites this key: late b3 must NOT clobber it
                ("U", 30_001, "conv-000001", 1, "user", "late rewrite", dt.datetime(2024, 1, 3)),
                # batch 4 deletes this NEVER-inserted key (tombstone):
                # late b3's insert must not resurrect it
                ("I", 30_002, "conv-000002", 77, "user", "late insert", dt.datetime(2024, 1, 3, 0, 0, 1)),
                # untouched by batch 4: late b3 must apply normally
                ("I", 30_003, "conv-000003", 88, "tool", "late only", dt.datetime(2024, 1, 3, 0, 0, 2)),
            ],
            EV_DDL,
        )
    )
    b4 = incremental_batch(spark, 4, 80, N_CONVS, TURNS, p_delete=0.2).union(
        spark.createDataFrame(
            [
                ("U", 40_001, "conv-000001", 1, "assistant", "newer rewrite", dt.datetime(2024, 1, 4)),
                ("D", 40_002, "conv-000002", 77, None, None, dt.datetime(2024, 1, 4, 0, 0, 1)),
            ],
            EV_DDL,
        )
    )
    return [b1, b2, b3, b4]


def test_late_batch_equals_serial_replay(spark, tmp_path):
    batches = gen_batches(spark)

    serial = bootstrap_table(spark, str(tmp_path / "serial"), TRANSCRIPT_SCHEMA, num_buckets=8)
    orch_s = CdcOrchestrator(serial)
    for i, b in enumerate(batches, start=1):
        orch_s.apply_batch(b, i)

    ooo = bootstrap_table(spark, str(tmp_path / "ooo"), TRANSCRIPT_SCHEMA, num_buckets=8)
    orch_o = CdcOrchestrator(ooo)
    orch_o.apply_batch(batches[0], 1)
    orch_o.apply_batch(batches[1], 2)
    orch_o.apply_batch(batches[3], 4)  # batch 3 goes missing
    qdir = str(tmp_path / "quarantine")
    rec = orch_o.apply_late_batch(batches[2], 3, quarantine_dir=qdir)

    assert rec["late_apply"] is True
    assert rec["events_dropped_superseded"] > 0
    assert_pdf_equal(
        current_state(serial).toPandas(), current_state(ooo).toPandas(), KEY
    )
    live = current_state(ooo).toPandas().set_index(["conv_id", "turn_idx"])
    assert live.loc[("conv-000001", 1), "text"] == "newer rewrite"
    assert ("conv-000002", 77) not in live.index  # newer tombstone held
    assert live.loc[("conv-000003", 88), "text"] == "late only"

    # Quarantined events are exactly the superseded ones, readable for audit.
    q = spark.read.parquet(f"{qdir}/batch-000003")
    assert q.count() == rec["events_dropped_superseded"]
    assert {("conv-000001", 1), ("conv-000002", 77)} <= {
        (r["conv_id"], r["turn_idx"]) for r in q.select(*KEY).collect()
    }


def test_late_batch_exactly_once_and_newest_noop(spark, tmp_path):
    batches = gen_batches(spark)
    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    orch = CdcOrchestrator(table)
    orch.apply_batch(batches[0], 1)
    # Late apply of the NEWEST batch id degenerates to a plain apply
    # (empty supersession set).
    rec = orch.apply_late_batch(batches[1], 2)
    assert rec["events_dropped_superseded"] == 0
    # Exactly-once: a redelivery of the same late batch is a no-op.
    assert orch.apply_late_batch(batches[1], 2)["skipped"] == "already-committed"


def test_late_batch_refuses_pending_mor_deltas(spark, tmp_path):
    from tpc_di_spark.cdc.mor import apply_batch_mor

    batches = gen_batches(spark)
    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    orch = CdcOrchestrator(table)
    orch.apply_batch(batches[0], 1)
    apply_batch_mor(orch, batches[3], 4)
    with pytest.raises(ValueError, match="pending MoR delta"):
        orch.apply_late_batch(batches[2], 3)

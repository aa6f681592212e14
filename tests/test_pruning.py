"""Sparse-batch bucket pruning: a micro-batch touching few keys rewrites
only their buckets; every other bucket's files carry forward by reference
(the property that makes copy-on-write viable at 10^10 rows)."""

import datetime as dt

from tpc_di_spark.cdc import CdcOrchestrator, current_state
from tpc_di_spark.cdc.generator import historical_batch
from tpc_di_spark.cdc.orchestrator import bootstrap_table
from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA


def test_sparse_batch_rewrites_only_touched_buckets(spark, tmp_path):
    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=64)
    orch = CdcOrchestrator(table, buckets_per_group=8)  # grouped (pruned) path
    orch.apply_batch(historical_batch(spark, 200, 10), 1)
    before = {b: list(fl) for b, fl in table.snapshot.files.items()}

    micro = spark.createDataFrame(
        [
            ("U", 1, "conv-000003", 2, "user", "edited", dt.datetime(2024, 6, 1)),
            ("U", 2, "conv-000007", 5, "user", "edited", dt.datetime(2024, 6, 1)),
            ("D", 3, "conv-000009", 1, None, None, dt.datetime(2024, 6, 1)),
        ],
        "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    rec = orch.apply_batch(micro, 2)
    assert rec["buckets_touched"] <= 3

    after = table.snapshot.files
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == rec["buckets_touched"]
    untouched = [b for b in before if b not in changed]
    assert len(untouched) >= 61
    for b in untouched:
        assert after[b] == before[b], "untouched buckets must carry forward by reference"

    # Correctness of the pruned merge.
    state = {(r.conv_id, r.turn_idx): r.text for r in current_state(table).collect()}
    assert state[("conv-000003", 2)] == "edited"
    assert ("conv-000009", 1) not in state
    assert len(state) == 200 * 10 - 1


def test_point_lookup_prunes_buckets(spark, tmp_path):
    """lookup() composes bucket pruning with a pushed-down literal
    predicate: k keys scan at most k buckets' files, and the answer
    matches a full-scan filter exactly."""
    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=64)
    orch = CdcOrchestrator(table)
    orch.apply_batch(historical_batch(spark, 200, 10), 1)

    keys = [
        {"conv_id": "conv-000003", "turn_idx": 2},
        {"conv_id": "conv-000007", "turn_idx": 5},
    ]
    got = table.lookup(keys)
    rows = got.collect()
    assert {(r.conv_id, r.turn_idx) for r in rows} == {
        ("conv-000003", 2),
        ("conv-000007", 5),
    }
    assert all(r.is_current for r in rows)

    # Bucket pruning is real: the scan touches at most 2 of 64 buckets.
    total_files = sum(len(v) for v in table.snapshot.files.values())
    assert len(got.inputFiles()) <= 2 * max(
        len(v) for v in table.snapshot.files.values()
    )
    assert len(got.inputFiles()) < total_files

    # The literal predicate reaches the parquet scan (row-group pruning):
    # the scan node advertises pushed filters naming the key column.
    plan = got._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "conv_id" in pushed[0]

    # Full SCD2 lineage of one key via family="all".
    orch.apply_batch(
        spark.createDataFrame(
            [("U", 1, "conv-000003", 2, "user", "edited", dt.datetime(2024, 6, 1))],
            "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, "
            "role string, text string, ts timestamp",
        ),
        2,
    )
    lineage = table.lookup(keys[0], family="all").collect()
    assert len(lineage) == 2
    assert sorted(r.is_current for r in lineage) == [False, True]
    live = table.lookup(keys[0], family="current").collect()
    assert [r.text for r in live] == ["edited"]

    # Partial key (missing a bucket column) must refuse, not full-scan.
    import pytest

    with pytest.raises(ValueError, match="bucket columns"):
        table.lookup({"conv_id": "conv-000003"})

    # Large key sets downgrade to a semi-join but stay correct.
    many = [
        {"conv_id": f"conv-{i:06d}", "turn_idx": 1} for i in range(100)
    ]
    assert table.lookup(many).count() == 100

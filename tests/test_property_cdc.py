"""Property-based CDC semantics check (SURVEY §5.2 item 3, generalized):
for ANY sequence of change events — arbitrary key collisions, NULL-field
updates, deletes, out-of-order timestamps across batches, any batch
split — the distributed engine's final state equals the sequential
oracle's."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import assert_pdf_equal
from tpc_di_spark.cdc import CdcOrchestrator, current_state
from tpc_di_spark.cdc.oracle import OracleState
from tpc_di_spark.cdc.orchestrator import bootstrap_table
from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

T0 = dt.datetime(2024, 1, 1)

event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["c0", "c1", "c2"]),  # few keys -> heavy collisions
    st.integers(0, 2),
    st.one_of(st.none(), st.sampled_from(["user", "assistant", "tool"])),
    st.one_of(st.none(), st.text(alphabet="abxyz", min_size=0, max_size=6)),
    st.integers(0, 50),  # ts seconds (duplicates + out-of-order likely)
)

events_st = st.lists(event_st, min_size=1, max_size=25)
split_st = st.integers(1, 3)


@pytest.fixture(scope="module")
def counter():
    return {"n": 0}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=events_st, n_batches=split_st)
def test_any_event_sequence_matches_oracle(spark, tmp_path_factory, counter, events, n_batches):
    rows = [
        (flag, i, conv, turn, role, text, T0 + dt.timedelta(seconds=ts))
        for i, (flag, conv, turn, role, text, ts) in enumerate(events)
    ]
    schema = (
        "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, "
        "role string, text string, ts timestamp"
    )
    # Split into contiguous batches (the oracle applies the same split).
    size = max(1, len(rows) // n_batches)
    chunks = [rows[i : i + size] for i in range(0, len(rows), size)]

    counter["n"] += 1
    path = str(tmp_path_factory.mktemp("prop") / f"t{counter['n']}")
    table = bootstrap_table(spark, path, TRANSCRIPT_SCHEMA, num_buckets=4)
    orch = CdcOrchestrator(table)
    oracle = OracleState(payload_cols=["role", "text", "ts"])
    for bid, chunk in enumerate(chunks, start=1):
        df = spark.createDataFrame(chunk, schema)
        orch.apply_batch(df, bid)
        oracle.apply_batch(
            pd.DataFrame(
                chunk,
                columns=["cdc_flag", "cdc_dsn", "conv_id", "turn_idx", "role", "text", "ts"],
            ),
            bid,
        )

    got = current_state(table).toPandas()
    want = oracle.current_df()
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])

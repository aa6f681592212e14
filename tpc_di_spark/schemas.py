"""Canonical StructType schemas — single source of truth.

The reference declares every schema twice (Python NamedTuple + SQL DDL,
e.g. `Historical/DimCustomer.py:70-102` vs `:521-563`); here each lives
once as a StructType and both the engine and the tests import it.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# The engine's target table: multi-turn conversation / agent transcripts.
# Business key: (conv_id, turn_idx). `tool` arrives via schema evolution.
# ---------------------------------------------------------------------------

TRANSCRIPT_DATA_FIELDS = [
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), True),
    StructField("text", StringType(), True),
    StructField("ts", TimestampType(), True),
]

# SCD2 lineage columns, echoing the reference's IsCurrent / EffectiveDate /
# EndDate / BatchID on every dimension row (Historical/DimCustomer.py:99-102,
# Incremental1/IncrementalAccount.py:57-60).
LINEAGE_FIELDS = [
    StructField("is_current", BooleanType(), False),
    StructField("effective_ts", TimestampType(), True),
    StructField("end_ts", TimestampType(), True),
    StructField("batch_id", IntegerType(), True),
]

TRANSCRIPT_SCHEMA = StructType(TRANSCRIPT_DATA_FIELDS + LINEAGE_FIELDS)

# With the evolution column present (from the evolution batch onward).
TRANSCRIPT_DATA_FIELDS_EVOLVED = TRANSCRIPT_DATA_FIELDS[:4] + [
    StructField("tool", StringType(), True),
    TRANSCRIPT_DATA_FIELDS[4],
]
TRANSCRIPT_SCHEMA_EVOLVED = StructType(TRANSCRIPT_DATA_FIELDS_EVOLVED + LINEAGE_FIELDS)

# ---------------------------------------------------------------------------
# CDC change-event envelope. Mirrors the reference's CDC_FLAG/CDC_DSN prefix
# (Incremental1/IncrementalCustomer.py:107-108) generalized with deletes.
# ---------------------------------------------------------------------------

CHANGE_EVENT_SCHEMA = StructType(
    [
        StructField("cdc_flag", StringType(), False),  # 'I' | 'U' | 'D'
        StructField("cdc_dsn", LongType(), False),  # monotone within batch
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), False),  # LWW ordering key
    ]
)

CHANGE_EVENT_SCHEMA_EVOLVED = StructType(
    CHANGE_EVENT_SCHEMA.fields[:6]
    + [StructField("tool", StringType(), True), CHANGE_EVENT_SCHEMA.fields[6]]
)

KEY_COLS = ("conv_id", "turn_idx")
SEQ_COLS = ("ts", "cdc_dsn")  # LWW order: ts, tie-broken by sequence number

END_OF_TIME = "9999-12-31 00:00:00"

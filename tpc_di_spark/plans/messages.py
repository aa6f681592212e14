"""DImessages — the queryable audit/alert table (SURVEY P12 side-outputs).

The reference records validation alerts and per-load status rows in a
DImessages table (`Historical/test.py:249-267` builds DimMessage records
for invalid SPRatings; `Historical/prospect.py:158-163` inserts a
"Status: Inserted rows" message per load). Round 1 carried alerts only as
boolean columns and metrics only as JSON files; this module makes them a
first-class queryable table:

- ``alert_messages``   — project any alert condition over a DataFrame into
  message rows (one per offending row, with a key=value data payload).
- ``status_messages``  — a one-row status record per load step.
- ``MessagesLog``      — an append-only parquet table of message rows.

All message production is declarative column work (filter + concat) — the
alert scan rides the same pass as the main pipeline, no extra job.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StructType

MESSAGES_SCHEMA = (
    "message_ts timestamp, batch_id int, message_source string, "
    "message_type string, message_text string, message_data string"
)


def _kv_payload(data_cols: Sequence[str]) -> Column:
    """`CO_ID = 7, CO_SP_RATE = ZZZ`-style payload (`test.py:254`)."""
    parts = [
        F.concat(F.lit(f"{c} = "), F.coalesce(F.col(c).cast("string"), F.lit("NULL")))
        for c in data_cols
    ]
    return F.concat_ws(", ", *parts)


def alert_messages(
    df: DataFrame,
    condition: Column,
    source: str,
    message_text: str,
    data_cols: Sequence[str],
    ts_col: str | None = None,
    batch_id: int = 1,
    message_type: str = "Alert",
) -> DataFrame:
    """One message row per row of ``df`` satisfying ``condition`` —
    the alert side-output shape of `Historical/test.py:249-263`."""
    ts = F.col(ts_col).cast("timestamp") if ts_col else F.lit(None).cast("timestamp")
    return df.filter(condition).select(
        ts.alias("message_ts"),
        F.lit(batch_id).alias("batch_id"),
        F.lit(source).alias("message_source"),
        F.lit(message_type).alias("message_type"),
        F.lit(message_text).alias("message_text"),
        _kv_payload(data_cols).alias("message_data"),
    )


def status_messages(
    spark: SparkSession,
    source: str,
    text: str,
    data: str,
    batch_id: int,
    ts=None,
) -> DataFrame:
    """One status row (`prospect.py:158-163`: "Status: Inserted rows")."""
    return spark.createDataFrame(
        [(ts, batch_id, source, "Status", text, data)], MESSAGES_SCHEMA
    )


class MessagesLog:
    """Append-only parquet table of DImessages rows.

    Plain directory-append is sufficient here (messages are an audit
    side-channel, not the transactional table); route it through a
    LakeTable if exactly-once message delivery is required.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.schema: StructType = (
            spark.createDataFrame([], MESSAGES_SCHEMA).schema
        )

    def append(self, messages: DataFrame) -> None:
        messages.select(*self.schema.fieldNames()).write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.schema(self.schema).parquet(self.path)

"""Event-time streaming aggregations with late-data handling.

The batch engine answers "what is the table state after replaying the
stream"; these operators answer the continuous questions on the same
change-event tail — counts per event-time window, gap-based sessions, and
custom per-key running state — the Structured Streaming way:

- **Watermarks** bound state: an event older than the watermark relative
  to the max event time seen is late and dropped; everything newer is
  aggregated exactly once per window. The reference has no streaming
  path at all (strictly sequential batch files, report §4.3).
- ``F.window`` / ``F.session_window`` are the built-in JVM-side windowed
  aggregations — used instead of hand-rolled state wherever they fit
  (the batch analogue of ``session_window`` is
  ``operators/windows.sessionize``, and a batch-mode parity test pins
  the two to each other).
- ``applyInPandasWithState`` is the custom-stateful escape hatch for
  semantics the built-ins can't express — here, a per-conversation
  running digest (turn count, last role/ts) maintained across
  micro-batches with Arrow-batched transfer, never row-at-a-time Python.

All functions accept either a streaming or a batch DataFrame; watermarks
are no-ops in batch mode, so every semantic is unit-testable in batch and
exercised end-to-end through a real file-tail stream in the tests.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("conv_id",),
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time counts per key.
    Late events beyond ``watermark`` are dropped; in append output mode a
    window emits once, when the watermark passes its end."""
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            *key_cols,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "last_ts",
        )
    )


def session_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("conv_id",),
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via the built-in ``session_window`` — the
    streaming twin of ``operators/windows.sessionize`` (same gap rule:
    a new session starts when the time since the previous event of the
    key exceeds the gap)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("sess"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            *key_cols,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


CONV_STATE_OUTPUT = StructType.fromDDL(
    "conv_id string, n_turns long, last_role string, last_ts timestamp"
)
CONV_STATE_SCHEMA = StructType.fromDDL("n_turns long, last_role string, last_ts_us long")


def running_conversation_state(events: DataFrame) -> DataFrame:
    """Per-conversation running digest maintained across micro-batches —
    the custom stateful operator shape (``applyInPandasWithState``):
    count of turns seen, plus the role/timestamp of the latest turn by
    event time. State is a fixed-width tuple per conversation; each
    micro-batch updates it from an Arrow batch, emitting one updated row
    per touched conversation (update output mode)."""
    import pandas as pd

    def update(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        (conv_id,) = key
        n, role, last_us = state.get if state.exists else (0, None, -1)
        for pdf in pdfs:
            n += len(pdf)
            # Normalize to MICROSECONDS explicitly: a bare astype("int64")
            # on a datetime column yields whatever resolution the Arrow
            # bridge produced (ns on older pandas/pyarrow stacks, us on
            # this one) — environment-dependent. datetime64[us] first
            # makes the unit unconditional, so pd.Timestamp(last_us,
            # unit="us") below is always correct.
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            us = ts_us.max()
            if us > last_us:
                idx = ts_us.idxmax()
                role = pdf["role"].loc[idx]
                last_us = int(us)
        state.update((n, role, last_us))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n],
                "last_role": [role],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=CONV_STATE_OUTPUT,
        stateStructType=CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

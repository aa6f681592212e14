"""Window/aggregation operators (SURVEY §2.4).

Each function is a reusable DataFrame transform re-expressing a semantic
unit the reference implements imperatively; the physical plan is a single
window exchange (or one shuffle for the grouped forms) — never the
reference's O(n^2) rescans (`Historical/fact_market_history.py:76-97`).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def running_balance(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    amount_col: str,
    alias: str = "balance",
) -> DataFrame:
    """Grouped running balance — SURVEY A1, re-expressing the reference's
    driver-side defaultdict accumulation (`Historical/fact_cash_balances.py:
    36-101`) as one cumulative-sum window."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(amount_col).over(w))


def top1_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence,
) -> DataFrame:
    """Top-1 per key (ORDER BY ... LIMIT 1 per-key lookups in the reference,
    `Incremental1/IncrementalFactCashBalances.py:161`; SURVEY A5).
    ``order_cols`` are Columns (use .desc() as needed); the first row per
    key under that order is kept. One window shuffle, rank pushed before
    any wide payload materialization."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def trailing_extreme_with_argdate(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    days: int = 365,
    extreme: str = "max",
) -> DataFrame:
    """Trailing N-day extreme with the earliest date it occurred —
    SURVEY A2, the 52-week high/low of `Incremental1/
    IncrementalFactMarketHistory.py:169-272` ("MAX(DAYHIGH), MIN(SK_DateID)").

    Implemented as a bounded range self-join (each probe row joins only
    peer rows of the same key within the window) followed by a two-level
    aggregate: the extreme, then the earliest peer date achieving it.
    The join keys on ``key_col`` so Catalyst plans a shuffled hash/SMJ on
    a fine-grained key; the date band is a post-join filter. At 100 TB the
    band is bounded (365 days), so per-key fan-out is capped by history
    depth, not table size.
    """
    probe = df.select(
        F.col(key_col).alias("k"),
        F.col(date_col).alias("d"),
    ).distinct()
    peer = df.select(
        F.col(key_col).alias("k2"),
        F.col(date_col).alias("pd"),
        F.col(value_col).alias("pv"),
    )
    j = probe.join(
        peer,
        (F.col("k") == F.col("k2"))
        & (F.col("pd") >= F.col("d") - F.expr(f"INTERVAL {days} DAYS"))
        & (F.col("pd") <= F.col("d")),
    )
    agg = F.max if extreme == "max" else F.min
    ext = j.groupBy("k", "d").agg(agg("pv").alias("ext"))
    j2 = j.join(ext, ["k", "d"]).filter(F.col("pv") == F.col("ext"))
    return (
        j2.groupBy("k", "d")
        .agg(F.min("pd").alias("ext_date"), F.first("ext").alias("ext_value"))
        .select(
            F.col("k").alias(key_col),
            F.col("d").alias(date_col),
            F.col("ext_value"),
            F.col("ext_date"),
        )
    )


def trailing_sum_ratio(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    days: int = 365,
) -> DataFrame:
    """Trailing-period sum with ratio + missing-history alert — SURVEY A3,
    the PERatio = close / sum(EPS over prior year) with NULL + alert when
    no earnings exist (`Incremental1/IncrementalFactMarketHistory.py:
    276-329`). The band is strictly prior ([d-365d, d)), so the current
    row never contributes to its own denominator."""
    probe = df.select(
        F.col(key_col).alias("k"),
        F.col(date_col).alias("d"),
        F.col(value_col).alias("v"),
    )
    peer = df.select(
        F.col(key_col).alias("k2"),
        F.col(date_col).alias("pd"),
        F.col(value_col).cast("decimal(18,2)").alias("pv"),
    )
    j = probe.join(
        peer,
        (F.col("k") == F.col("k2"))
        & (F.col("pd") >= F.col("d") - F.expr(f"INTERVAL {days} DAYS"))
        & (F.col("pd") < F.col("d")),
        "left",
    )
    return (
        j.groupBy("k", "d", "v")
        .agg(F.sum("pv").cast("double").alias("trailing_sum"))
        .select(
            F.col("k").alias(key_col),
            F.col("d").alias(date_col),
            F.col("v").alias(value_col),
            "trailing_sum",
            F.try_divide(F.col("v"), F.col("trailing_sum")).alias("ratio"),
            F.col("trailing_sum").isNull().alias("alert_no_history"),
        )
    )


def change_detect(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence,
    compare_cols: Sequence[str],
    alias: str = "changed",
) -> DataFrame:
    """Per-key change detection vs the previous version — SURVEY A8, the
    reference's 21-column diff (`Incremental1/IncrementalFactProspect.py:
    234-307`) as null-safe lag comparisons (<=> negation)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    return df.withColumn(
        alias, F.when(F.row_number().over(w) == 1, F.lit(None)).otherwise(changed)
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds the gap. lag + conditional
    cumulative sum — one window exchange (the batch analogue of
    Structured Streaming's session_window)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | (F.col(ts_col) - prev > F.expr(f"INTERVAL {gap_minutes * 60} SECONDS"))
    ).cast("int")
    cum = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_session).over(cum))


def scd2_from_log(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Reconstruct SCD2 lineage from an append-only event log — the query
    form of SURVEY M1: effective_ts = own ts, end_ts = next version's ts,
    is_current = no successor."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("effective_ts", F.col(ts_col))
        .withColumn("end_ts", nxt)
        .withColumn("is_current", nxt.isNull())
    )

"""Deterministic synthetic change-event generator (no UDFs, no RNG objects).

Mirrors the shape of TPC-DI's DIGen batches (report §3.1.2): Batch1 is a
historical bulk load (all 'I'); Batch2..k are CDC files mixing I/U/D with a
monotone in-batch sequence (`Incremental1/IncrementalCustomer.py:107-108`).
Every value is a pure column expression of the row id, so generation is
fully distributed, reproducible, and scales linearly with cores — the same
generator drives 10^3-row tests and 10^7+-row benches.

Skew: conversation ids are drawn from a power-law transform of a
hash-uniform variate (``floor(n_convs * u^(1+skew))``), producing the
Zipf-ish hot-conversation distribution the north_rule requires the engine
to survive.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BASE_EPOCH = 1_700_000_000  # 2023-11-14 22:13:20 UTC; fixed for determinism


def _conv_id(conv):
    """``format_string('conv-%06d', conv)`` without java.util.Formatter:
    printf-style formatting allocates a Formatter + argument boxing per
    row and was the hottest expression in the generation stage (string
    building is the generator's memory-bandwidth cost; at 8 concurrent
    tasks per-task run time inflated 1.7x). concat+lpad is codegen-
    friendly and byte-identical for non-negative ids; ids over 6 digits
    keep their full decimal form exactly like %06d."""
    s = conv.cast("string")
    return F.concat(F.lit("conv-"), F.when(F.length(s) > 6, s).otherwise(F.lpad(s, 6, "0")))


def _dec(c):
    return c.cast("string")


def _u(col_id, salt: str):
    """Deterministic uniform-ish variate in [0,1) from the row id."""
    return (F.pmod(F.xxhash64(col_id, F.lit(salt)), F.lit(1_000_000_007)) / F.lit(1_000_000_007.0))


def _payload_text(conv, turn, batch_id, rid, text_repeat: int):
    """Deterministic turn text. ``text_repeat`` > 0 appends a repeated
    filler sentence so payload bytes approximate real transcript turns
    (hundreds of chars) instead of tag-sized strings; the unique prefix
    keeps per-turn equality checks meaningful."""
    # concat of decimal casts == the old format_string("%d") byte-for-
    # byte, minus the per-row java.util.Formatter (see _conv_id).
    tag = F.concat(
        F.lit("text c"), _dec(conv), F.lit(" t"), _dec(turn),
        F.lit(" b"), _dec(F.lit(batch_id)), F.lit(" s"), _dec(rid),
    )
    if text_repeat <= 0:
        return tag
    filler = F.repeat(
        F.concat(F.lit(" lorem ipsum turn token "), _dec(F.pmod(rid, F.lit(97)))),
        text_repeat,
    )
    return F.concat(tag, filler)


def historical_batch(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int,
    batch_id: int = 1,
    partitions: int | None = None,
    text_repeat: int = 0,
) -> DataFrame:
    """Batch1: one 'I' per (conv, turn) — the historical load."""
    n = n_convs * turns_per_conv
    df = spark.range(0, n, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int")
    return df.select(
        F.lit("I").alias("cdc_flag"),
        F.col("id").alias("cdc_dsn"),
        _conv_id(conv).alias("conv_id"),
        turn.alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(F.xxhash64("id", F.lit("role")), F.lit(3)) + 1).cast("int"),
        ).alias("role"),
        _payload_text(conv, turn, batch_id, F.col("id"), text_repeat).alias("text"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id")).alias("ts"),
    )


def incremental_batch(
    spark: SparkSession,
    batch_id: int,
    n_events: int,
    n_convs: int,
    turns_per_conv: int,
    p_update: float = 0.6,
    p_delete: float = 0.05,
    skew: float = 0.0,
    with_tool: bool = False,
    partitions: int | None = None,
    text_repeat: int = 0,
) -> DataFrame:
    """Batch k>=2: a mix of I (new turns beyond the historical range),
    U (rewrites of existing turns), D (occasional deletes), with duplicate
    keys inside the batch (LWW fold exercise) arising naturally from
    collisions. ``with_tool=True`` adds the evolution column."""
    df = spark.range(0, n_events, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")
    u_conv = _u(rid, f"conv{batch_id}")
    alpha = 1.0 + max(skew, 0.0)
    conv = F.floor(F.lit(float(n_convs)) * F.pow(u_conv, F.lit(alpha))).cast("long")
    conv = F.least(conv, F.lit(n_convs - 1))

    u_flag = _u(rid, f"flag{batch_id}")
    is_delete = u_flag < F.lit(p_delete)
    is_update = (~is_delete) & (u_flag < F.lit(p_delete + p_update))
    flag = F.when(is_delete, "D").when(is_update, "U").otherwise("I")

    # Updates/deletes target existing turns; inserts extend the conversation
    # into a per-batch turn range so they are genuinely new keys.
    upd_turn = F.pmod(F.xxhash64(rid, F.lit(f"ut{batch_id}")), F.lit(turns_per_conv)).cast("int")
    ins_turn = (
        F.lit(turns_per_conv * batch_id)
        + F.pmod(F.xxhash64(rid, F.lit(f"it{batch_id}")), F.lit(turns_per_conv)).cast("int")
    )
    turn = F.when(flag == "I", ins_turn).otherwise(upd_turn).cast("int")

    base = F.lit(BASE_EPOCH + batch_id * 100_000_000)
    cols = [
        flag.alias("cdc_flag"),
        rid.alias("cdc_dsn"),
        _conv_id(conv).alias("conv_id"),
        turn.alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(F.xxhash64(rid, F.lit("role")), F.lit(3)) + 1).cast("int"),
        ).alias("role"),
        _payload_text(conv, turn, batch_id, rid, text_repeat).alias("text"),
    ]
    if with_tool:
        cols.append(
            F.when(
                F.pmod(F.xxhash64(rid, F.lit("tool?")), F.lit(4)) == 0,
                F.concat(F.lit("tool_"), _dec(F.pmod(F.xxhash64(rid, F.lit("toolid")), F.lit(8)))),
            ).alias("tool")
        )
    cols.append(F.timestamp_seconds(base + rid).alias("ts"))
    return df.select(*cols)

"""Explicit key salting for skewed aggregations and joins.

The engine's primary skew defense is structural: the lake buckets on the
full business key (conv_id, turn_idx), so a hot conversation spreads over
all buckets. These helpers cover the remaining shapes — per-conversation
aggregates and joins against a skewed key — where one key's rows would
otherwise land on one reducer. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on by default in our session) is
the runtime backstop; salting is the plan-level guarantee.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, cols: Sequence[str], buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a hash of the full row
    identity columns — never a RNG, so retries/replays are stable."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output name -> (function, column) for functions with a
    distributive merge: sum/count/min/max. Phase 1 aggregates per
    (key, salt) — the hot key's rows split over ``buckets`` reducers;
    phase 2 merges the partials per key (at most ``buckets`` rows per key,
    trivially balanced).

    Example: salted_agg(events, ['conv_id'],
                        {'n_turns': ('count', '*'), 'last_ts': ('max', 'ts')},
                        salt_from=['turn_idx'])
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
        elif fn in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"{fn!r} is not distributive; salted_agg supports sum/count/min/max")
    salted = with_salt(df, list(salt_from), buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(*phase1_exprs)
    final_exprs = [merge_fn[aggs[out][0]](out).alias(out) for out in aggs]
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_broadcast_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "left",
) -> DataFrame:
    """Skew-proof join of a skewed fact against a small dimension: salt the
    fact, explode the dimension across all salt values, join on
    (key, salt). Because the dim side is exploded x buckets, it must be
    broadcast-sized; for big-big skew, rely on AQE skew-join instead."""
    # Salt from the row's natural columns (never monotonically_increasing_id:
    # task retries re-assign those ids, so the salt would differ between an
    # attempt and its retry). A hash of the full row is retry/replay-stable.
    salted = skewed.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(buckets)
        ).cast("int"),
    )
    exploded = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted.join(F.broadcast(exploded), [*on, "_salt"], how)
    return out.drop("_salt")

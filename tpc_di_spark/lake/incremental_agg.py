"""Incremental aggregate maintenance from the changelog — a real
"binlog out" CONSUMER: a per-conversation stats table kept current by
reading only what changed, never replaying or rescanning the fact table.

This is the canonical downstream shape for a lake-resident CDC engine
(feature tables, index builders, rollup marts): TPC-DI itself has no
changelog consumer (its incremental batches are inputs only —
`Incremental1/*.py` read Batch2 extracts); this completes the engine's
changelog (`lake/changelog.py`) with the thing the changelog exists FOR.

Maintained stats per ``conv_id``:

- ``live_turns``       — count of currently-live ``(conv_id, turn_idx)``
  rows. Exact under inserts/updates/deletes WITHOUT key-level state:
  every version the engine materializes is created exactly once and
  closed at most once, so per conversation
  ``live = Σ created − Σ closed`` (insert +1/−0, update +1/−1,
  delete +0/−1).
- ``versions_created`` / ``versions_closed`` — monotone lineage
  counters (the per-batch version churn).
- ``last_event_ts``    — max event ts over created versions: a monotone
  "latest activity" watermark (a delete does not rewind it).

Scale shape: one refresh costs one file-skipped scan of the range's
created/closed versions (``rows_created_since`` / ``rows_closed_since``
— per-file ``batch_id`` stats bound the scan set to the touched
batches) plus one key-partitioned join against the conv-cardinality
state — O(changed + state), independent of table age or lineage depth.
At 10^10 rows, bucket the state table by ``conv_id`` hash to make the
merge join co-located.

Compaction interplay: a compaction/rebucket AFTER the consumer's
checkpoint rewrites history files and erases their closing-batch path
tags, so the one-scan closed-side read would under-count. The consumer
detects any compact/rebucket snapshot since its checkpoint in
``table.history()`` and falls back to per-batch
:func:`~tpc_di_spark.lake.changelog.rows_closed_in`, which recovers
exactness by time-traveling to each batch's committing snapshot — the
consumer is therefore EXACT at any checkpoint cadence within the
snapshot-retention window (Iceberg's incremental-read contract).

Crash safety / exactly-once: each refresh writes a fresh
``state-b{N}`` parquet directory, then atomically flips ``_ckpt.json``
through the table's :class:`~tpc_di_spark.lake.fs.TableFS` (rename on
POSIX, conditional PUT on object stores). A crash between the two
leaves the old checkpoint pointing at the old state; the re-run
recomputes the same delta from the same snapshot range — idempotent.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from tpc_di_spark.lake.changelog import (
    rows_closed_in,
    rows_closed_since,
    rows_created_since,
)
from tpc_di_spark.lake.table import LakeTable

STATE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("live_turns", LongType(), False),
        StructField("versions_created", LongType(), False),
        StructField("versions_closed", LongType(), False),
        StructField("last_event_ts", TimestampType(), True),
    ]
)

_CKPT = "_ckpt.json"


class ConvStatsConsumer:
    """Incrementally-maintained per-conversation stats over a transcript
    ``LakeTable`` (see module docstring for semantics and guarantees)."""

    def __init__(
        self, table: LakeTable, state_dir: str, state_partitions: int = 1
    ) -> None:
        # state_partitions sizes the state parquet: 1 at test scale; at
        # 10^10 rows use ~state_bytes/128MB and repartition by conv_id
        # hash so successive refresh joins co-locate.
        self.table = table
        self.state_dir = state_dir
        self.state_partitions = state_partitions
        self.fs = table.fs
        self.fs.makedirs(state_dir)

    # -- checkpoint ---------------------------------------------------------

    def _ckpt_path(self) -> str:
        return os.path.join(self.state_dir, _CKPT)

    def _load_ckpt(self) -> dict | None:
        if not self.fs.exists(self._ckpt_path()):
            return None
        return json.loads(self.fs.read_text(self._ckpt_path()))

    # -- state --------------------------------------------------------------

    def state(self) -> DataFrame:
        """The maintained stats as of the last :meth:`refresh`."""
        ck = self._load_ckpt()
        if ck is None:
            return self.table.spark.createDataFrame([], STATE_SCHEMA)
        return self.table.spark.read.schema(STATE_SCHEMA).parquet(
            os.path.join(self.state_dir, ck["state_rel"])
        )

    # -- refresh ------------------------------------------------------------

    def _needs_per_batch_fallback(self, ck: dict | None) -> bool:
        """True when the one-scan closed-side read can't be trusted and
        the refresh must take the per-batch time-travel path:

        - a compact/rebucket snapshot exists after the checkpoint
          (compaction rewrites history files and erases their closing-
          batch path tags);
        - there is NO checkpoint yet but history shows any compaction
          (bootstrap over an already-compacted table — the range scan
          from batch 0 would silently skip every rewritten file);
        - the checkpoint's snapshot is no longer reachable in
          ``table.history()`` (``expire_snapshots`` pruned it): absence
          of evidence is not evidence of no compaction, so fall back —
          and warn, since exactness now depends on the per-batch
          snapshots still being within the retention window (if they
          were expired too, the time-travel reads raise loudly).
        """
        hist = self.table.history()
        since = ck["snapshot_id"] if ck else -1
        if ck is not None and not any(h["snapshot_id"] <= since for h in hist):
            import warnings

            warnings.warn(
                f"consumer checkpoint snapshot {since} was expired from "
                f"{self.table.path}; forcing the per-batch time-travel "
                "refresh path (exact only within snapshot retention)",
                stacklevel=3,
            )
            return True
        return any(
            h["snapshot_id"] > since
            and h["summary"].get("operation") in ("compact", "rebucket")
            for h in hist
        )

    def refresh(self) -> DataFrame:
        """Catch the state up through every committed batch; returns it.

        Reads ONLY the changelog of the unconsumed batch range; calling
        again with nothing new committed is a no-op."""
        self.table.refresh()
        snap = self.table.snapshot
        committed = sorted(snap.committed_batches)
        ck = self._load_ckpt()
        last_batch = ck["batch_id"] if ck else 0

        # MATERIALIZATION HORIZON: a merge-on-read batch enters
        # committed_batches while its rows are still un-materialized
        # delta files (invisible to the changelog until compaction, which
        # then stamps them with their ORIGINAL batch ids). Advancing the
        # checkpoint past a pending delta batch would therefore lose its
        # rows forever — consume only below the oldest pending delta and
        # catch up after compaction materializes them.
        from tpc_di_spark.cdc.mor import pending_delta_batches

        pending_mor = [d["batch_id"] for d in pending_delta_batches(self.table)]
        horizon = min(pending_mor) if pending_mor else None
        pending = [
            b for b in committed if b > last_batch and (horizon is None or b < horizon)
        ]
        if not pending:
            return self.state()
        upto = pending[-1]

        conv = "conv_id"
        created = rows_created_since(self.table, last_batch, snap, upto_batch_id=upto)
        c_agg = created.groupBy(conv).agg(
            F.count(F.lit(1)).alias("_c_n"), F.max("ts").alias("_c_ts")
        )
        if self._needs_per_batch_fallback(ck):
            # exact fallback: per-batch closed reads time-travel to each
            # committing snapshot (the range-scan tags were rewritten).
            closed = None
            for b in pending:
                part = rows_closed_in(self.table, b, snap)
                closed = part if closed is None else closed.unionByName(part)
        else:
            closed = rows_closed_since(self.table, last_batch, snap, upto_batch_id=upto)
        d_agg = closed.groupBy(conv).agg(F.count(F.lit(1)).alias("_d_n"))

        delta = c_agg.join(d_agg, conv, "full_outer")
        merged = (
            self.state()
            .join(delta, conv, "full_outer")
            .select(
                F.col(conv),
                (
                    F.coalesce(F.col("live_turns"), F.lit(0))
                    + F.coalesce(F.col("_c_n"), F.lit(0))
                    - F.coalesce(F.col("_d_n"), F.lit(0))
                ).alias("live_turns"),
                (
                    F.coalesce(F.col("versions_created"), F.lit(0))
                    + F.coalesce(F.col("_c_n"), F.lit(0))
                ).alias("versions_created"),
                (
                    F.coalesce(F.col("versions_closed"), F.lit(0))
                    + F.coalesce(F.col("_d_n"), F.lit(0))
                ).alias("versions_closed"),
                F.greatest(F.col("last_event_ts"), F.col("_c_ts")).alias(
                    "last_event_ts"
                ),
            )
            # a conversation enters the state with its first created
            # version (delete events for never-seen keys are no-ops)
            .filter(F.col("versions_created") > 0)
        )

        state_rel = f"state-b{upto:06d}"
        merged.repartition(self.state_partitions, conv).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, state_rel)
        )
        new_ck = json.dumps(
            {"batch_id": upto, "snapshot_id": snap.snapshot_id, "state_rel": state_rel}
        )
        if ck is None and not self.fs.exists(self._ckpt_path()):
            self.fs.write_text(self._ckpt_path(), new_ck)
        else:
            self.fs.replace_text(self._ckpt_path(), new_ck)
        self._prune_old_states(keep=(state_rel, ck["state_rel"] if ck else None))
        return self.state()

    def _prune_old_states(self, keep: tuple) -> None:
        # keep the new state and its predecessor (crash window); prune rest
        for name in self.fs.listdir(self.state_dir):
            if name.startswith("state-b") and name not in keep:
                self.fs.rmtree(os.path.join(self.state_dir, name))

"""Batch orchestrator: exactly-once CDC apply with mid-batch resume.

Replaces the reference's AWS Step Functions chain (report §4.2-4.3) with a
deterministic local protocol:

1. **Exactly-once**: each LakeTable snapshot records its committed batch
   ids; re-applying a committed batch is a no-op. The snapshot flip is the
   single atomic commit point — a crash anywhere before it leaves the old
   table state fully live (the reference's per-row INSERT stream has no
   such property; a killed Lambda leaves half a batch applied,
   `Incremental1/IncrementalAccount.py:218-343`).

2. **Mid-batch resume via per-partition-group checkpoint manifests**: the
   touched buckets are split into groups; each group's merge output is
   written to a *deterministic* path and sealed with a ``.done`` manifest
   (file list + per-bucket row counts = partition lineage). A resumed run
   skips sealed groups, recomputes unsealed ones (their partial output is
   overwritten — deterministic tags make this idempotent), then performs
   the one atomic snapshot commit.

3. **Schema evolution**: a batch carrying new payload columns triggers a
   transactional evolve-then-apply (metadata-only schema commit, then the
   merge), per north_rule.

4. **Observability**: a JSON metrics record per batch (row counts,
   per-bucket lineage, wall time, snapshot id) lands in ``_metrics/``.

5. **Ordering repair**: ``apply_snapshot_batch`` folds late initial-
   snapshot chunks under tail deletes (DBLog rule); ``apply_late_batch``
   applies a missed batch after higher-numbered ones under the
   supersession rule — final current state is arrival-order independent.
"""

from __future__ import annotations

import json
import os
import time
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from tpc_di_spark.cdc.apply import (
    ENVELOPE_COLS,
    align_events,
    data_cols,
    insert_only_rows,
    lww_dedup,
    merge_batch_rows,
)
from tpc_di_spark.lake.table import LakeTable

_STAGING = "_staging"
_METRICS = "_metrics"


class CdcOrchestrator:
    def __init__(
        self,
        table: LakeTable,
        buckets_per_group: int = 8,
        count_input: bool = True,
        messages_log=None,
        auto_compact_files_per_bucket: int = 0,
        null_key_policy: str = "error",
    ):
        self.table = table
        self.spark = table.spark
        self.buckets_per_group = buckets_per_group
        # count_input=False skips the pre-dedup events.count() (a full
        # extra pass over the source); metrics then report the post-LWW
        # count as events_in=None. Used by throughput benches.
        self.count_input = count_input
        # Optional plans.messages.MessagesLog: one queryable DImessages
        # status row per applied batch (the reference's "Status: Inserted
        # rows" insert, `Historical/prospect.py:158-163`). Opt-in — the
        # metrics JSON remains the zero-extra-job default.
        self.messages_log = messages_log
        # NULL-business-key events are upstream garbage: an equi-join
        # merge can never match them again, so once written they are
        # unreachable junk rows (and pre-round-6 they silently VANISHED
        # from the merge — the presence-marker fix in cdc/apply.py makes
        # them visible instead). Policy: "error" (default) fails the
        # batch when any key column is NULL — checked inside the same
        # job as the input count, so it costs nothing extra; with
        # count_input=False the check is documented-skipped along with
        # the count (the bench's zero-extra-job contract). "drop"
        # filters them out free-of-charge in the same scan and reports
        # events_null_key in the metrics.
        if null_key_policy not in ("error", "drop"):
            raise ValueError(f"unknown null_key_policy {null_key_policy!r}")
        self.null_key_policy = null_key_policy
        # Opt-in compaction policy: after each committed batch, buckets
        # whose TOTAL file count (current + history) exceeds this are
        # rewritten by lake.maintenance.compact. The history family is
        # append-only, so every batch adds one hist file per touched
        # bucket — without a policy, file count grows linearly with batch
        # count and the scan's file-open overhead with it. 0 disables
        # (callers schedule compaction themselves, like the bench).
        self.auto_compact_files_per_bucket = auto_compact_files_per_bucket

    def for_table(self, table: LakeTable) -> "CdcOrchestrator":
        """Same configuration over a different table handle — the WAP
        staging pattern (drive a branch handle through an orchestrator
        configured like the main one)."""
        return CdcOrchestrator(
            table,
            buckets_per_group=self.buckets_per_group,
            count_input=self.count_input,
            messages_log=self.messages_log,
            auto_compact_files_per_bucket=self.auto_compact_files_per_bucket,
            null_key_policy=self.null_key_policy,
        )

    def _key_null_expr(self):
        key_null = None
        for k in self.table.key_cols:
            c = F.col(k).isNull()
            key_null = c if key_null is None else (key_null | c)
        return key_null

    def _account_input(self, events: DataFrame, batch_id: int):
        """EAGER input accounting: (events, n_events, n_null_key) in AT
        MOST one job. Used by the exception paths (snapshot handover,
        late repair) whose early ``limit(1).count()`` guard actions would
        corrupt a lazy Observation (a limit can stop before scanning
        every row, so observed metrics from that action undercount). The
        hot ``apply_batch`` path uses :meth:`_lazy_account_input` — same
        numbers, ZERO extra pass."""
        key_null = self._key_null_expr()
        n_events = n_null = None
        if self.count_input:
            row = events.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(key_null.cast("long")), F.lit(0)).alias("nn"),
            ).collect()[0]
            n_events, n_null = row["n"], row["nn"]
            self._check_null_policy(n_null, batch_id)
        if self.null_key_policy == "drop":
            events = events.filter(~key_null)
        return events, n_events, n_null

    def _lazy_account_input(self, events: DataFrame):
        """Zero-extra-job input accounting for the hot apply path: attach
        an :class:`pyspark.sql.Observation` computing (total, null-key
        count) INSIDE whatever job first materializes the batch (the
        grouped path's bucket-count job, or the single-group path's merge
        write) instead of running a dedicated ``agg().collect()`` pass
        over the source — at sf0.1 that pass was ~40% of a batch's wall
        time, and at scale it is a full extra read of the change stream.
        Resolve with :meth:`_resolve_accounting` after the first action.
        The "drop" policy's filter sits ABOVE the observation so dropped
        rows still count (events_in is the pre-drop total, as before)."""
        if not self.count_input:
            if self.null_key_policy == "drop":
                events = events.filter(~self._key_null_expr())
            return events, None
        from pyspark.sql import Observation

        key_null = self._key_null_expr()
        obs = Observation()
        events = events.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(key_null.cast("long")), F.lit(0)).alias("nn"),
        )
        if self.null_key_policy == "drop":
            events = events.filter(~key_null)
        return events, obs

    def _resolve_accounting(self, obs, batch_id: int, ensure: DataFrame | None = None):
        """Read a :meth:`_lazy_account_input` observation after an action
        materialized the observed plan. ``ensure`` forces a materializing
        action first — only the resumed single-group path needs it (its
        manifest made the write a no-op, so no job ran over the events).
        Enforces the same null_key_policy='error' contract as the eager
        path: the batch still fails BEFORE its atomic commit, so no bad
        state becomes visible (the error now surfaces after the merge
        compute instead of before it)."""
        if obs is None:
            return None, None
        if isinstance(obs, tuple):  # eager_accounting already resolved
            return obs
        if ensure is not None:
            ensure.count()
        row = obs.get
        n_events, n_null = row["n"], row["nn"]
        self._check_null_policy(n_null, batch_id)
        return n_events, n_null

    def _check_null_policy(self, n_null, batch_id: int) -> None:
        if n_null and self.null_key_policy == "error":
            raise ValueError(
                f"batch {batch_id}: {n_null} events carry NULL business-"
                f"key columns ({list(self.table.key_cols)}) — upstream "
                "garbage an equi-join merge can never match again. Fix "
                "the source, or construct the orchestrator with "
                "null_key_policy='drop' to filter and count them."
            )

    # ------------------------------------------------------------ utilities
    def _staging_dir(self, batch_id: int) -> str:
        return os.path.join(self.table.path, _STAGING, f"batch-{batch_id:06d}")

    def _metrics_path(self, batch_id: int) -> str:
        return os.path.join(self.table.path, _METRICS, f"batch-{batch_id:06d}.json")

    def _geometry(self, group_buckets: list | None) -> dict:
        """Group geometry stamped into every checkpoint manifest. A batch
        killed mid-apply and resumed under a different geometry (e.g.
        grouped -> single-group) must NOT reuse a manifest that covers only
        part of the new group's buckets — the resume would silently drop
        every bucket absent from the stale manifest."""
        return {
            "buckets_per_group": self.buckets_per_group,
            "num_buckets": self.table.num_buckets,
            "group_buckets": group_buckets,  # None = whole-table single group
        }

    def _manifest_valid(self, manifest: dict, geometry: dict, table_path: str) -> bool:
        return manifest.get("geometry") == geometry and all(
            self.table.fs.exists(os.path.join(table_path, rel))
            for fmap in (manifest["files"], manifest.get("hist_files", {}))
            for fl in fmap.values()
            for rel in fl
        )

    def _lineage_rows(
        self, files: dict[str, list[str]], hist_delta: dict[str, list[str]]
    ) -> tuple[dict[str, int], dict[str, list]]:
        """Per-bucket rows written this batch AND per-file batch_id
        [min, max] ranges (the changelog data-skipping stats), from
        parquet footers — driver-side metadata, no Spark job. Footer
        reads are independent ranged GETs, so they run on a thread pool:
        the serial loop was a per-batch driver cost that did not shrink
        with executor count (the family split doubled the file count and
        made it visible)."""
        from concurrent.futures import ThreadPoolExecutor

        paths: list[tuple[str, str]] = [
            (b, rel)
            for fmap in (files, hist_delta)
            for b, fl in fmap.items()
            for rel in fl
        ]

        def meta(p: tuple[str, str]):
            b, rel = p
            full = os.path.join(self.table.path, rel)
            return (
                b,
                rel,
                self.table.fs.parquet_num_rows(full),
                self.table.fs.parquet_column_minmax(full, "batch_id"),
            )

        rows: dict[str, int] = {}
        stats: dict[str, list] = {}
        with ThreadPoolExecutor(max_workers=16) as pool:
            for b, rel, n, mm in pool.map(meta, paths):
                rows[b] = rows.get(b, 0) + n
                if mm is not None:
                    stats[rel] = mm
        return rows, stats

    def _maybe_auto_compact(self, record: dict) -> None:
        """Post-commit compaction policy (see __init__): bounds per-bucket
        file counts under the append-only history family. Runs OUTSIDE the
        batch's atomic commit — a crash here loses nothing (the batch is
        already durable; compaction is its own snapshot and re-triggers
        next batch)."""
        if self.auto_compact_files_per_bucket <= 0:
            return
        from tpc_di_spark.lake.maintenance import compact

        stats = compact(
            self.table, max_files_per_bucket=self.auto_compact_files_per_bucket
        )
        if stats["compacted_buckets"]:
            record["auto_compact"] = stats
        # On indexed tables the same policy bounds SIDECAR count: each
        # commit adds one, and probe-time metadata loads are O(sidecars).
        # Consolidation is metadata-only (no data moves), so riding the
        # compaction trigger keeps both file and sidecar growth bounded
        # by one knob.
        if self.table.snapshot.properties.get("index.bloom.column"):
            from tpc_di_spark.lake.maintenance import consolidate_blooms
            from tpc_di_spark.lake.table import CommitConflict

            try:
                brec = consolidate_blooms(
                    self.table, max_sidecars=max(self.auto_compact_files_per_bucket, 4)
                )
            except CommitConflict:
                # Opportunistic maintenance racing a duelling writer: the
                # BATCH already committed, so surfacing the conflict here
                # would make a successful apply look failed to callers
                # (aborting run_replay mid-run). Record and move on — the
                # next batch's trigger retries consolidation.
                record["auto_consolidate_blooms"] = {"skipped": "commit-conflict"}
                return
            if brec.get("consolidated"):
                record["auto_consolidate_blooms"] = brec

    def _maybe_evolve(self, events: DataFrame, batch_id: int) -> None:
        """Transactional evolve-then-apply: add payload columns the batch
        introduces (e.g. ``tool``) before touching any data."""
        known = set(data_cols(self.table)) | set(ENVELOPE_COLS)
        new_fields = [f for f in events.schema.fields if f.name not in known]
        if not new_fields:
            return
        old = self.table.schema
        # Insert new payload columns before the lineage block, keeping a
        # stable human-readable order.
        lineage = [f for f in old.fields if f.name in ("is_current", "effective_ts", "end_ts", "batch_id")]
        payload = [f for f in old.fields if f not in lineage]
        evolved = StructType(
            payload + [StructField(f.name, f.dataType, True) for f in new_fields] + lineage
        )
        self.table.evolve_schema(evolved)

    # ------------------------------------------------------------ main apply
    def apply_batch(self, events: DataFrame, batch_id: int, retries: int = 2) -> dict:
        """Apply one CDC batch exactly once, with optimistic-concurrency
        retry: a :class:`CommitConflict` means another writer advanced the
        table between this apply's snapshot read and its commit CAS, so
        the staged merge (computed against the stale snapshot) is
        discarded and the whole apply recomputes against the new state —
        the Iceberg commit-retry rule, which a CoW merge needs in full
        (its output depends on the target rows, so nothing staged is
        salvageable). The re-run's ``is_batch_committed`` check also
        resolves the duelling-driver case where the competing writer
        committed THIS batch id. Bounded (default 2 re-computations) so
        livelock surfaces as the underlying conflict."""
        from tpc_di_spark.lake.table import CommitConflict

        try:
            return self._apply_batch_once(events, batch_id)
        except CommitConflict:
            if retries <= 0:
                raise
            staging = self._staging_dir(batch_id)
            if self.table.fs.exists(staging):
                self.table.fs.rmtree(staging)
            self.table.refresh()
            return self.apply_batch(events, batch_id, retries=retries - 1)

    def _apply_batch_once(self, events: DataFrame, batch_id: int) -> dict:
        """One optimistic attempt of :meth:`apply_batch`."""
        t0 = time.monotonic()
        if batch_id <= 0:
            # Negative batch ids are the delete-tombstone marker
            # (cdc/apply.py) — real batches must stay strictly positive.
            raise ValueError(f"batch_id must be >= 1, got {batch_id}")
        self.table.refresh()
        if self.table.is_batch_committed(batch_id):
            return {"batch_id": batch_id, "skipped": "already-committed"}

        self._maybe_evolve(events, batch_id)
        events = align_events(events, self.table)
        if getattr(self, "eager_accounting", False):
            # foreachBatch micro-batch plans break CollectMetrics (the
            # stream execution thread stack-overflows re-planning the
            # observed node), so streaming drivers opt back into the
            # eager one-job accounting (streaming/stream_apply.py).
            events, n_eager, nn_eager = self._account_input(events, batch_id)
            obs = (n_eager, nn_eager)
        else:
            events, obs = self._lazy_account_input(events)

        # ONE exchange for the whole batch: repartition the events to the
        # table's bucket layout BEFORE the LWW groupBy. The groupBy's
        # ClusteredDistribution(key) is satisfied by that partitioning
        # (no aggregate exchange), the merge join against the bucketed
        # target scan is satisfied by it (no join exchange), and the
        # family-split write is bucket-co-located by it (no write
        # exchange). Trade: the LWW fold loses its pre-shuffle partial
        # combine, so a key duplicated k times in one batch ships k rows
        # instead of O(partitions) — CDC batches carry ~1-2 events/key,
        # and the hot-CONVERSATION skew story is unchanged (full-key
        # bucketing spreads a hot conversation's turns over all buckets).
        deduped = lww_dedup(
            self.table.bucket_partitioned(events), self.table.key_cols
        )
        deduped = self.table.with_bucket(deduped)

        if self.buckets_per_group >= self.table.num_buckets:
            # Single-group fast path: the batch is merged against the whole
            # table in ONE pass (generation -> dedup shuffle -> merge join
            # -> write), skipping the separate touched-bucket discovery job
            # that would recompute the dedup. Right when batches touch most
            # buckets anyway (bulk replays, benches); bucket-pruned multi-
            # group mode remains the default for sparse batches.
            return self._apply_single_group(
                events, deduped, batch_id, obs, t0
            )

        try:
            # Persist BEFORE the bucket-count job so that ONE pass
            # computes the dedup DAG: the count materializes the cache
            # and every group's merge reads from it. (The old order —
            # persist after the count, only for multi-group batches —
            # recomputed the full upstream DAG once for the count and
            # again for the first group; for changelog-derived batches
            # that DAG is itself joins over the parent table.) At
            # cluster scale this caches the batch (<= events), never the
            # table.
            deduped.persist()
            # One job yields both the touched-bucket set and per-bucket
            # event counts (metadata-sized collect: <= num_buckets rows).
            bucket_counts = {
                r[0]: r[1]
                for r in deduped.groupBy(LakeTable.BUCKET_COL).count().collect()
            }
            # That job materialized the observed events, so the input
            # accounting resolves here at zero extra cost — and the
            # null_key_policy='error' check still fires BEFORE any write.
            n_events, n_null = self._resolve_accounting(obs, batch_id)
            touched = sorted(bucket_counts)
            groups = [
                touched[i : i + self.buckets_per_group]
                for i in range(0, len(touched), self.buckets_per_group)
            ]
            staging = self._staging_dir(batch_id)
            self.table.fs.makedirs(staging)

            all_files: dict[str, list[str]] = {}
            all_hist: dict[str, list[str]] = {}
            all_stats: dict[str, list] = {}
            group_metrics = []
            n_deduped = 0
            for gi, buckets in enumerate(groups):
                manifest_path = os.path.join(staging, f"group-{gi:03d}.done.json")
                geometry = self._geometry(buckets)
                if self.table.fs.exists(manifest_path):
                    manifest = json.loads(self.table.fs.read_text(manifest_path))
                    if self._manifest_valid(manifest, geometry, self.table.path):
                        all_files.update(manifest["files"])
                        for b, fl in manifest.get("hist_files", {}).items():
                            all_hist.setdefault(b, []).extend(fl)
                        all_stats.update(manifest.get("file_stats", {}))
                        group_metrics.append({**manifest["metrics"], "resumed": True})
                        n_deduped += manifest["metrics"].get("events", 0)
                        continue
                g0 = time.monotonic()
                src = deduped.filter(F.col(LakeTable.BUCKET_COL).isin(buckets))
                # Only the CURRENT file family joins the merge: history
                # files are immutable closed versions the merge can never
                # touch — skipping them halves-or-better the per-batch
                # scan as history accumulates. read_bucketed exposes the
                # group's buckets as a catalog bucketed scan so the merge
                # join adds no Exchange above the table side.
                if any(
                    self.table.snapshot.files.get(str(b)) for b in buckets
                ):
                    tgt, aligned = self.table.read_bucketed(
                        family="current", buckets=buckets
                    )
                    merged = merge_batch_rows(
                        tgt, src.drop(LakeTable.BUCKET_COL), batch_id, self.table,
                    )
                else:  # no current rows in this group: insert-only projection
                    merged = insert_only_rows(
                        src.drop(LakeTable.BUCKET_COL), batch_id, self.table
                    )
                    aligned = self.table.spark_aligned
                tag = f"batch-{batch_id:06d}/group-{gi:03d}"
                files, hist_delta = self.table.write_data_files_split(
                    self.table.with_bucket(merged), tag,
                    # Skip the write exchange only when the merge inputs
                    # really were in the bucket layout (bucketed scan +
                    # bucket_partitioned events, or an insert-only
                    # projection of the bucket-partitioned batch). When
                    # read_bucketed fell back to a plain scan the join
                    # output's layout is the planner's choice — cluster
                    # it, or the partitionBy write can emit partitions x
                    # buckets small files. See LakeTable._bucket_clustered.
                    assume_bucket_partitioned=aligned,
                )
                lineage_rows, fstats = self._lineage_rows(files, hist_delta)
                n_src = sum(bucket_counts[b] for b in buckets)
                n_deduped += n_src
                metrics = {
                    "group": gi,
                    "buckets": buckets,
                    "events": n_src,
                    "rows_written": {str(k): v for k, v in lineage_rows.items()},
                    "secs": round(time.monotonic() - g0, 3),
                }
                self.table.fs.replace_text(
                    manifest_path,
                    json.dumps({
                        "files": files,
                        "hist_files": hist_delta,
                        "file_stats": fstats,
                        "metrics": metrics,
                        "geometry": geometry,
                    }),
                )
                all_files.update(files)
                for b, fl in hist_delta.items():
                    all_hist.setdefault(b, []).extend(fl)
                all_stats.update(fstats)
                group_metrics.append(metrics)
        finally:
            deduped.unpersist(blocking=False)

        before = self.table.snapshot.snapshot_id
        snap = self.table.commit(
            new_files_by_bucket=all_files,
            mode="replace",
            replaced_buckets=touched,
            batch_id=batch_id,
            append_hist_by_bucket=all_hist,
            new_file_stats=all_stats,
            summary={"operation": "cdc-apply", "events": n_events},
        )
        if snap.snapshot_id == before:
            # commit() hit its exactly-once guard without flipping: a
            # duelling driver landed this batch id first. Our salted-
            # attempt files are unreferenced (expire-swept); the staging
            # manifests memoize only OUR attempt, so drop them with it.
            self.table.fs.rmtree(staging)
            return {"batch_id": batch_id, "skipped": "already-committed"}
        self.table.fs.rmtree(staging)
        elapsed = time.monotonic() - t0
        record = {
            "batch_id": batch_id,
            "snapshot_id": snap.snapshot_id,
            "events_in": n_events,
            "events_null_key": n_null,
            "events_after_lww": n_deduped,
            "buckets_touched": len(touched),
            "groups": group_metrics,
            "secs": round(elapsed, 3),
            "events_per_sec": (
                round((n_events or n_deduped) / elapsed, 1) if elapsed > 0 else None
            ),
        }
        self._maybe_auto_compact(record)
        self.table.fs.makedirs(os.path.dirname(self._metrics_path(batch_id)))
        self.table.fs.replace_text(self._metrics_path(batch_id), json.dumps(record))
        self._emit_status(record)
        return record

    def _apply_single_group(
        self, events, deduped, batch_id, obs, t0
    ) -> dict:
        """One-pass apply of a batch that spans (potentially) every bucket.
        Same checkpoint manifest + atomic commit as the grouped path; the
        resume granularity is the whole batch. ``obs`` is the lazy input-
        accounting observation — it resolves off the merge write itself
        (the batch's ONLY pass over the events), and the null-key error
        policy is enforced before the atomic commit."""
        staging = self._staging_dir(batch_id)
        self.table.fs.makedirs(staging)
        manifest_path = os.path.join(staging, "group-000.done.json")
        geometry = self._geometry(None)
        resumed = False
        hist_delta: dict[str, list[str]] = {}
        fstats: dict[str, list] = {}
        if self.table.fs.exists(manifest_path):
            manifest = json.loads(self.table.fs.read_text(manifest_path))
            if self._manifest_valid(manifest, geometry, self.table.path):
                files = manifest["files"]
                hist_delta = manifest.get("hist_files", {})
                fstats = manifest.get("file_stats", {})
                metrics = {**manifest["metrics"], "resumed": True}
                resumed = True
        if not resumed:
            g0 = time.monotonic()
            # Current family only — history is append-only and immutable,
            # so the merge neither reads nor rewrites it (the r02 shape
            # re-read AND re-wrote every closed version every batch; at
            # the 10^10 design point history is the bulk of the table).
            # Bucketed scan: the full-outer merge join plans with NO
            # Exchange above the table side, and its output stays
            # physically bucket-partitioned so the write skips its
            # repartition too — the batch's only shuffle is the incoming
            # events' bucket_partitioned exchange in apply_batch. An
            # empty current family (historical load / bootstrap) skips
            # the join entirely: insert-only projection.
            if self.table.snapshot.files:
                tgt, aligned = self.table.read_bucketed(family="current")
                merged = merge_batch_rows(
                    tgt, deduped.drop(LakeTable.BUCKET_COL), batch_id, self.table
                )
            else:
                merged = insert_only_rows(
                    deduped.drop(LakeTable.BUCKET_COL), batch_id, self.table
                )
                aligned = self.table.spark_aligned
            tag = f"batch-{batch_id:06d}/group-000"
            files, hist_delta = self.table.write_data_files_split(
                self.table.with_bucket(merged), tag,
                assume_bucket_partitioned=aligned,
            )
            lineage_rows, fstats = self._lineage_rows(files, hist_delta)
            metrics = {
                "group": 0,
                "buckets": sorted(int(b) for b in set(files) | set(hist_delta)),
                "events": None,
                "rows_written": lineage_rows,
                "secs": round(time.monotonic() - g0, 3),
            }
            self.table.fs.replace_text(
                manifest_path,
                json.dumps({
                    "files": files,
                    "hist_files": hist_delta,
                    "file_stats": fstats,
                    "metrics": metrics,
                    "geometry": geometry,
                }),
            )
        # The write above (or, on resume, a forced pass — the manifest
        # made the write a no-op, so nothing materialized the events yet)
        # resolves the lazy accounting; the error policy still fires
        # before the commit below, so no bad state becomes visible.
        n_events, n_null = self._resolve_accounting(
            obs, batch_id, ensure=events if resumed else None
        )

        # Every pre-existing CURRENT-family bucket was merged (and may
        # have lost all its rows to deletes), so the replaced set is
        # old ∪ new current buckets; history is append-only.
        replaced = set(self.table.snapshot.files) | set(files)
        before = self.table.snapshot.snapshot_id
        snap = self.table.commit(
            new_files_by_bucket=files,
            mode="replace",
            replaced_buckets=replaced,
            batch_id=batch_id,
            append_hist_by_bucket=hist_delta,
            new_file_stats=fstats,
            summary={"operation": "cdc-apply", "events": n_events},
        )
        if snap.snapshot_id == before:
            # Exactly-once no-op (duelling driver won this batch id) —
            # see the grouped path; our files/manifests are ours alone.
            self.table.fs.rmtree(staging)
            return {"batch_id": batch_id, "skipped": "already-committed"}
        self.table.fs.rmtree(staging)
        elapsed = time.monotonic() - t0
        record = {
            "batch_id": batch_id,
            "snapshot_id": snap.snapshot_id,
            "events_in": n_events,
            "events_null_key": n_null,
            "events_after_lww": None,
            "buckets_touched": len(replaced),
            "groups": [metrics],
            "secs": round(elapsed, 3),
            "events_per_sec": round(n_events / elapsed, 1) if n_events and elapsed > 0 else None,
        }
        self._maybe_auto_compact(record)
        self.table.fs.makedirs(os.path.dirname(self._metrics_path(batch_id)))
        self.table.fs.replace_text(self._metrics_path(batch_id), json.dumps(record))
        self._emit_status(record)
        return record

    # ------------------------------------------------- snapshot handover
    def apply_snapshot_batch(
        self, events: DataFrame, batch_id: int, tail_start_batch: int = 0
    ) -> dict:
        """Apply one initial-/incremental-snapshot chunk (Debezium
        ``op='r'``) that may arrive AFTER tail batches were already
        applied — the CDC bootstrap-handover problem.

        The reference sidesteps handover by strict sequencing (the
        historical load completes before Batch2 starts, report §4.3);
        a real binlog consumer cannot: connectors emit snapshot chunks
        interleaved with the WAL tail (Debezium incremental snapshots /
        Netflix DBLog watermark windows), and this engine's cross-batch
        ordering is batch-id-first, so pushing a late point-in-time read
        through ``apply_batch`` would clobber newer tail rows and
        resurrect tail-deleted keys. Instead a snapshot chunk applies as
        MERGE WHEN NOT MATCHED **insert-if-absent**:

        - keys the tail touched since the handover watermark
          (``changed_keys_since(tail_start_batch)`` — created OR closed,
          so tail deletes are honored, INCLUDING deletes that matched no
          row yet: those leave ``batch_id = -batch`` tombstones, see
          ``cdc/apply.py``) are dropped: the DBLog chunk-vs-window dedup
          rule, resolved consumer-side;
        - keys already live in the table (pre-existing rows, overlapping
          or re-delivered chunks) are dropped: a point-in-time read
          never creates a new SCD2 version;
        - the remainder inserts as new current rows via the normal
          family-split write + exactly-once snapshot commit.

        One-shot bootstrap path: the two anti-joins cost one scan of the
        tail-touched keys (file-skipped, O(changed since watermark)) and
        one column-pruned scan of live keys — acceptable at handover
        time, not a steady-state cost. ``tail_start_batch`` is the
        batch watermark recorded when the snapshot read began (0 for a
        table born at handover).
        """
        t0 = time.monotonic()
        if batch_id <= 0:
            raise ValueError(f"batch_id must be >= 1, got {batch_id}")
        self.table.refresh()
        if self.table.is_batch_committed(batch_id):
            return {"batch_id": batch_id, "skipped": "already-committed"}
        from tpc_di_spark.cdc.mor import pending_delta_batches
        from tpc_di_spark.lake.changelog import changed_keys_since

        if pending_delta_batches(self.table):
            # changed_keys_since reads DATA files; keys touched only in
            # uncompacted MoR deltas are invisible to it, so applying a
            # chunk now could resurrect a delta-deleted key.
            raise ValueError(
                "pending MoR delta batches exist — compact them before "
                "applying a snapshot chunk (their touched keys are not "
                "yet visible to changed_keys_since)"
            )

        self._maybe_evolve(events, batch_id)
        events = align_events(events, self.table)
        events, n_events, n_null = self._account_input(events, batch_id)
        # A snapshot is a set of point-in-time READS — 'D' cannot occur.
        # Its presence means tail events were routed into the snapshot
        # path, where their deletes would be silently ignored: refuse.
        if events.filter(F.col("cdc_flag") == F.lit("D")).limit(1).count():
            raise ValueError(
                "snapshot batch contains 'D' events — deletes belong on "
                "the tail path (apply_batch); routing them here would "
                "silently drop them"
            )
        deduped = lww_dedup(
            self.table.bucket_partitioned(events), self.table.key_cols
        )
        key = list(self.table.key_cols)
        touched = changed_keys_since(self.table, tail_start_batch)
        src = deduped.join(touched.select(*key), on=key, how="left_anti")
        if self.table.snapshot.files:
            live = (
                self.table.read(family="current")
                .filter(F.col("is_current"))
                .select(*key)
            )
            src = src.join(live, on=key, how="left_anti")
        rows = insert_only_rows(src.drop(LakeTable.BUCKET_COL), batch_id, self.table)
        tag = f"batch-{batch_id:06d}/snapshot"
        # assume_bucket_partitioned=False: the anti-joins' output layout
        # is the planner's choice — let the write re-cluster the (small)
        # surviving insert set.
        files, _hist = self.table.write_data_files_split(
            self.table.with_bucket(rows), tag
        )
        lineage_rows, fstats = self._lineage_rows(files, {})
        before = self.table.snapshot.snapshot_id
        snap = self.table.commit(
            new_files_by_bucket=files,
            mode="append",
            batch_id=batch_id,
            new_file_stats=fstats,
            summary={
                "operation": "snapshot-handover",
                "events": n_events,
                "tail_start_batch": tail_start_batch,
            },
        )
        if snap.snapshot_id == before:
            # Exactly-once no-op: a duelling driver landed this chunk's
            # batch id first; our salted-attempt files are orphans.
            return {"batch_id": batch_id, "skipped": "already-committed"}
        elapsed = time.monotonic() - t0
        inserted = sum(lineage_rows.values()) if lineage_rows else 0
        record = {
            "batch_id": batch_id,
            "snapshot_id": snap.snapshot_id,
            "events_in": n_events,
            "events_null_key": n_null,
            "rows_inserted": inserted,
            "rows_dropped_stale_or_present": (
                (n_events - inserted) if n_events is not None else None
            ),
            "buckets_touched": len(files),
            "tail_start_batch": tail_start_batch,
            "secs": round(elapsed, 3),
        }
        self.table.fs.makedirs(os.path.dirname(self._metrics_path(batch_id)))
        self.table.fs.replace_text(self._metrics_path(batch_id), json.dumps(record))
        self._emit_status(record)
        return record

    def apply_late_batch(
        self,
        events: DataFrame,
        batch_id: int,
        quarantine_dir: str | None = None,
        retries: int = 2,
    ) -> dict:
        """Apply a MISSED batch that arrives after higher-numbered batches
        already committed — out-of-order tail repair (a redelivered WAL
        segment, a stalled connector partition catching up).

        The engine's cross-batch logical order is batch-id-first
        (``apply_batch`` expires whatever is current), so pushing a late
        batch through the normal path would clobber newer rows and
        resurrect newer deletes. Instead the late batch is applied under
        the supersession rule that makes the FINAL CURRENT STATE
        independent of arrival order:

        - events whose key was changed by ANY batch with id > this one
          (``changed_keys_since(table, batch_id)`` — created or closed,
          tombstones included, so newer deletes are honored) are
          **superseded**: dropped from the merge, counted, and optionally
          written to ``quarantine_dir/batch-NNNNNN`` for audit;
        - the remainder merges through the normal exactly-once apply
          (its keys were last touched by batches < this one, so batch-id
          order and arrival order agree for them).

        Equivalence: serial replay 1..N gives each key the LWW winner of
        the highest batch touching it; the anti-join reproduces exactly
        that partition of the late batch's keys. SCD2 *history* records
        arrival order (the missed batch's versions splice in at apply
        time, marked by their own batch id); the current family matches
        serial replay row-for-row. Cross-batch ``ts`` ties inside one key
        resolve to the higher batch id, same as serial replay.

        Cost: one file-skipped scan of the keys changed since this batch
        id (O(changed), the q47 changelog path) + one O(batch) broadcast-
        or-shuffle anti-join, on top of the normal merge. Late repair is
        an exception path, not steady state. Same MoR-delta guard as the
        snapshot handover: pending deltas hide touched keys from
        ``changed_keys_since``, so compaction must run first.
        """
        from tpc_di_spark.lake.table import CommitConflict

        t0 = time.monotonic()
        if batch_id <= 0:
            raise ValueError(f"batch_id must be >= 1, got {batch_id}")
        self.table.refresh()
        if self.table.is_batch_committed(batch_id):
            return {"batch_id": batch_id, "skipped": "already-committed"}
        from tpc_di_spark.cdc.mor import pending_delta_batches

        if pending_delta_batches(self.table):
            raise ValueError(
                "pending MoR delta batches exist — compact them before "
                "applying a late batch (their touched keys are not yet "
                "visible to the supersession check)"
            )
        self._maybe_evolve(events, batch_id)
        events = align_events(events, self.table)
        key = list(self.table.key_cols)
        touched = self._superseded_keys(batch_id)
        marked = events.join(
            touched.withColumn("_superseded", F.lit(True)), on=key, how="left"
        )
        marked.persist()
        try:
            stale = marked.filter(F.col("_superseded")).drop("_superseded")
            n_stale = stale.count()
            if quarantine_dir and n_stale:
                stale.write.mode("overwrite").parquet(
                    os.path.join(quarantine_dir, f"batch-{batch_id:06d}")
                )
            fresh = marked.filter(F.col("_superseded").isNull()).drop("_superseded")
            try:
                record = self.apply_batch(fresh, batch_id, retries=0)
            except CommitConflict:
                # A concurrent commit landed between our changed-keys read
                # and the merge CAS: the supersession set itself is stale
                # (the new batch may outrank this one), so the WHOLE late
                # apply recomputes, not just the merge.
                if retries <= 0:
                    raise
                marked.unpersist(blocking=False)
                staging = self._staging_dir(batch_id)
                if self.table.fs.exists(staging):
                    self.table.fs.rmtree(staging)
                self.table.refresh()
                return self.apply_late_batch(
                    events, batch_id, quarantine_dir, retries=retries - 1
                )
        finally:
            marked.unpersist(blocking=False)
        if record.get("skipped"):
            return record
        record = {
            **record,
            "late_apply": True,
            "events_dropped_superseded": n_stale,
            "secs": round(time.monotonic() - t0, 3),
        }
        self.table.fs.replace_text(self._metrics_path(batch_id), json.dumps(record))
        return record

    def _superseded_keys(self, batch_id: int) -> DataFrame:
        """EXACT set of keys changed by batches with id > ``batch_id``.

        `changed_keys_since` is the fast path, but it OVER-approximates
        once a compaction/rebucket erased closing tags ("closing batch
        unknown" files are included) — safe for consumers that merely
        re-pull extra keys, WRONG here where membership DROPS the late
        batch's events (over-approximation = data loss). When such a
        rewrite exists anywhere in retained history, rebuild the set
        per-batch instead: created keys from row-level batch_id (exact
        across compaction) plus closed keys from each batch's committing
        snapshot (time travel; ``strict=True`` raises when retention has
        expired it — a missed close would resurrect a newer delete, so
        "repair window passed" must be an error, not a silent wrong
        answer)."""
        from tpc_di_spark.lake.changelog import (
            _closing_batch_of,
            changed_keys_since,
            rows_closed_in,
            rows_created_in,
        )

        key = list(self.table.key_cols)
        # Gate the fast path STRUCTURALLY, not via retained snapshot
        # history: a compaction erases closing tags from the files it
        # rewrites, and once expire_snapshots drops the compaction
        # snapshot the history-based trigger goes blind — the fast path
        # would then include unknown-closing-tag files wholesale and
        # wrongly supersede (silently drop) legitimate late events. Any
        # history file whose rel carries no closing-batch tag forces the
        # exact per-batch reconstruction, regardless of what history
        # still shows.
        tags_intact = all(
            _closing_batch_of(rel) is not None
            for fl in self.table.snapshot.hist_files.values()
            for rel in fl
        )
        if tags_intact:
            return changed_keys_since(self.table, batch_id).select(*key)
        after = [
            b for b in sorted(self.table.snapshot.committed_batches) if b > batch_id
        ]
        touched = None
        for b in after:
            part = rows_created_in(self.table, b).select(*key).unionByName(
                rows_closed_in(
                    self.table, b, include_tombstones=True, strict=True
                ).select(*key)
            )
            touched = part if touched is None else touched.unionByName(part)
        if touched is None:  # nothing committed after the late id
            return self.table.read(family="current").select(*key).limit(0)
        return touched.distinct()

    def _emit_status(self, record: dict) -> None:
        if self.messages_log is None:
            return
        from tpc_di_spark.plans.messages import status_messages

        self.messages_log.append(
            status_messages(
                self.spark,
                source="CdcOrchestrator",
                text="Status: Applied batch",
                data=(
                    f"events = {record['events_in']}, "
                    f"buckets = {record['buckets_touched']}, "
                    f"snapshot = {record['snapshot_id']}"
                ),
                batch_id=record["batch_id"],
            )
        )

    def _compact_one_delta(self, events: DataFrame, orig_batch_id: int) -> dict:
        """Replay one pending MoR delta batch through the CoW merge and,
        in the SAME atomic commit, pop it from the pending-delta list.
        New row versions carry the ORIGINAL batch id, so the materialized
        lineage is identical to an all-CoW replay. Killed mid-compaction:
        nothing committed, the delta stays pending, and the retry writes
        a fresh salted attempt (the killed attempt's files are
        unreferenced orphans, expire-swept)."""
        import time as _time

        from tpc_di_spark.cdc.mor import pending_delta_batches

        t0 = _time.monotonic()
        deduped = lww_dedup(
            self.table.bucket_partitioned(align_events(events, self.table)),
            self.table.key_cols,
        )
        tgt, aligned = self.table.read_bucketed(family="current")
        merged = merge_batch_rows(tgt, deduped, orig_batch_id, self.table)
        tag = f"compact-delta-{orig_batch_id:06d}"
        files, hist_delta = self.table.write_data_files_split(
            self.table.with_bucket(merged), tag,
            assume_bucket_partitioned=aligned,
        )
        replaced = set(self.table.snapshot.files) | set(files)

        props = dict(self.table.snapshot.properties)
        remaining = [
            b for b in pending_delta_batches(self.table) if b["batch_id"] != orig_batch_id
        ]
        props["delta_batches"] = remaining
        snap = self.table.commit(
            new_files_by_bucket=files,
            mode="replace",
            replaced_buckets=replaced,
            batch_id=None,
            append_hist_by_bucket=hist_delta,
            summary={"operation": "compact-delta", "delta_batch": orig_batch_id},
            new_properties=props,
        )
        return {
            "delta_batch": orig_batch_id,
            "snapshot_id": snap.snapshot_id,
            "secs": round(_time.monotonic() - t0, 3),
        }

    # --------------------------------------------------------------- replay
    def replay(
        self, batches: Sequence[tuple[int, DataFrame]]
    ) -> list[dict]:
        """Apply batches strictly in order (the reference's Batch2→Batch3
        sequencing, report §4.3). Already-committed batches are skipped."""
        return [self.apply_batch(df, bid) for bid, df in batches]


def bootstrap_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    num_buckets: int = 16,
    fs=None,
    properties: dict | None = None,
) -> LakeTable:
    """Create-if-absent (the reference's CREATE TABLE IF NOT EXISTS,
    `Historical/DimCustomer.py:521-563`, SURVEY S9)."""
    if LakeTable.exists(path, fs=fs):
        return LakeTable.load(spark, path, fs=fs)
    return LakeTable.create(
        spark, path, schema, num_buckets=num_buckets, fs=fs, properties=properties
    )

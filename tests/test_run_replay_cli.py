"""The spark-submit deployment surface (run_replay.py): the north_rule's
`spark-submit --py-files` shape must work end-to-end from a clean
process — demo replay, exactly-once rerun, MoR mode with compaction."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(args, tmp_path):
    pkg = tmp_path / "pkg.zip"
    if not pkg.exists():
        shutil.make_archive(str(tmp_path / "pkg"), "zip", REPO, "tpc_di_spark")
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    cmd = [
        spark_submit, "--master", "local[4]", "--py-files", str(pkg),
        os.path.join(REPO, "tpc_di_spark", "run_replay.py"),
    ] + args
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="2g")
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(ln) for ln in out.stdout.splitlines() if ln.startswith("{")]


def test_cli_demo_replay_and_exactly_once(tmp_path):
    table_dir = str(tmp_path / "lake")
    args = ["--table-dir", table_dir, "--demo", "5000",
            "--num-buckets", "8", "--buckets-per-group", "8", "--cores", "4"]
    recs = _submit(args, tmp_path)
    summary = recs[-1]
    assert summary["rows"] > 0
    applied = [r for r in recs if r.get("batch_id")]
    assert [r["batch_id"] for r in applied] == [1, 2, 3]
    assert not any(r.get("skipped") for r in applied)
    # schema evolution happened for the with_tool demo batch
    assert any(h["summary"].get("operation") == "evolve-schema" for h in summary["history"])

    # second run, same table dir: every batch skips, state unchanged
    recs2 = _submit(args, tmp_path)
    applied2 = [r for r in recs2 if r.get("batch_id")]
    assert all(r.get("skipped") == "already-committed" for r in applied2)
    assert recs2[-1]["rows"] == summary["rows"]
    assert recs2[-1]["snapshot_id"] == summary["snapshot_id"]


def test_cli_mor_mode_with_compaction(tmp_path):
    table_dir = str(tmp_path / "lake_mor")
    recs = _submit(
        ["--table-dir", table_dir, "--demo", "4000", "--mode", "mor",
         "--compact", "--num-buckets", "8", "--cores", "4"],
        tmp_path,
    )
    assert any("compaction" in r for r in recs)
    summary = recs[-1]
    assert summary["rows"] > 0
    # compaction drained the pending delta list (all materialized)
    ops = [h["summary"].get("operation") for h in summary["history"]]
    assert "compact-delta" in ops


def test_cli_late_events_out_of_order_repair(spark, tmp_path):
    """--late-events applies a missed batch after newer ones: the final
    state must equal a serial replay of the same files, with superseded
    events counted (and the flag refused under --mode mor)."""
    from tpc_di_spark.cdc.generator import historical_batch, incremental_batch

    ev_dir = tmp_path / "ev"
    batches = [
        (1, historical_batch(spark, 100, 6, batch_id=1)),
        (2, incremental_batch(spark, 2, 800, 100, 6, skew=0.5)),
        (3, incremental_batch(spark, 3, 800, 100, 6, skew=0.5)),
    ]
    for bid, df in batches:
        df.write.mode("overwrite").parquet(str(ev_dir / f"b{bid}"))
    ev = lambda b: f"{b}={ev_dir / f'b{b}'}"  # noqa: E731

    serial = _submit(
        ["--table-dir", str(tmp_path / "serial"),
         "--events", ev(1), ev(2), ev(3),
         "--num-buckets", "8", "--buckets-per-group", "8", "--cores", "4"],
        tmp_path,
    )
    ooo = _submit(
        ["--table-dir", str(tmp_path / "ooo"),
         "--events", ev(1), ev(3), "--late-events", ev(2),
         "--quarantine-dir", str(tmp_path / "q"),
         "--num-buckets", "8", "--buckets-per-group", "8", "--cores", "4"],
        tmp_path,
    )
    late = [r for r in ooo if r.get("late_apply")]
    assert len(late) == 1 and late[0]["batch_id"] == 2
    assert late[0]["events_dropped_superseded"] > 0
    assert os.path.isdir(str(tmp_path / "q" / "batch-000002"))
    # CURRENT state equal row-for-row (full lineage legitimately differs:
    # superseded late events never create the versions serial replay
    # closes).
    from tpc_di_spark.cdc import current_state
    from tpc_di_spark.lake import LakeTable

    def live(d):
        t = LakeTable.load(spark, str(d))
        return {
            (r.conv_id, r.turn_idx, r.role, r.text)
            for r in current_state(t)
            .select("conv_id", "turn_idx", "role", "text")
            .collect()
        }

    assert live(tmp_path / "ooo") == live(tmp_path / "serial")

    # --late-events under MoR mode is an upfront argparse error.
    bad = subprocess.run(
        [shutil.which("spark-submit") or "spark-submit", "--master", "local[4]",
         "--py-files", str(tmp_path / "pkg.zip"),
         os.path.join(REPO, "tpc_di_spark", "run_replay.py"),
         "--table-dir", str(tmp_path / "x"), "--mode", "mor",
         "--late-events", ev(2)],
        capture_output=True, text=True, timeout=120,
    )
    assert bad.returncode != 0
    # spark-submit may fold the python process's stderr into either stream
    assert "--late-events requires --mode cow" in (bad.stderr + bad.stdout)


def test_cli_wap_demo_replay(tmp_path):
    """--wap stages each demo batch on a branch, audits, and publishes:
    all three batches land, audits are recorded in the per-batch output,
    and no branch refs remain."""
    table_dir = str(tmp_path / "lake_wap")
    recs = _submit(
        ["--table-dir", table_dir, "--demo", "3000", "--wap",
         "--num-buckets", "8", "--buckets-per-group", "8", "--cores", "4"],
        tmp_path,
    )
    applied = [r for r in recs if r.get("batch_id")]
    assert [r["batch_id"] for r in applied] == [1, 2, 3]
    for r in applied:
        assert r["wap"]["published"] is True
        assert all(c["ok"] for c in r["wap"]["audit"])
    assert recs[-1]["rows"] > 0
    assert not os.path.exists(os.path.join(table_dir, "_meta", "refs")) or not os.listdir(
        os.path.join(table_dir, "_meta", "refs")
    )

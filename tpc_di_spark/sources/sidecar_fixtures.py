"""Deterministic file-format sidecar fixtures for the contract queries.

The driver's tables are parquet, but the reference's whole intake is
pipe-delimited / CSV-with-header / fixed-width FINWIRE text
(`Incremental1/IncrementalCustomer.py:170-207`, `Historical/prospect.py:
71-104`, `Historical/test.py:66-181`). To contract-exercise those scans
(SURVEY S1/S2/S4/S6) with a DuckDB oracle, q44-q46 materialize a driver
table to text files in a deterministic temp location, re-read them
through ``sources/delimited.py`` / ``sources/fixed_width.py``, and the
oracle reads the SAME files with ``read_csv``.

Generation is pure-Python over the parquet (pyarrow), sorted by key —
byte-identical on every call, so regeneration is idempotent and the
Spark/DuckDB sides can run in either order (both regenerate-on-use at
import time for the oracle's fixed sf0.01 path).
"""

from __future__ import annotations

import os

SIDECAR_ROOT = "/tmp/spark_graft_sidecars"
BATCH_DATE = "2024-06-01"

_SP_RATINGS = ["AAA ", "AA+ ", "BBB ", "BB- "]


def sidecar_dir(sf_dir: str) -> str:
    return os.path.join(SIDECAR_ROOT, os.path.basename(os.path.normpath(sf_dir)))


def _rows(sf_dir: str, table: str, order_col: str):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
    cols = t.column_names
    data = t.to_pylist()
    data.sort(key=lambda r: r[order_col])
    return cols, data


def _write_atomic(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def make_sidecars(sf_dir: str) -> str:
    """Materialize all sidecar files for ``sf_dir``; returns the dir.

    - ``customer.psv``  — header-less pipe-delimited (S1), the reference's
      empty-string-for-NULL convention: c_mktsegment blanked for every
      7th key so the empty→NULL scan path is exercised.
    - ``part.csv``      — CSV with header (S2).
    - ``finwire.txt``   — fixed-width multi-record-type (S4): CMP records
      from supplier rows interleaved with FIN records the CMP scan must
      filter out; sp_rating blank for every 5th key (empty→NULL).
    - ``BatchDate.txt`` — batch-metadata scalar (S6).
    """
    out = sidecar_dir(sf_dir)
    os.makedirs(out, exist_ok=True)

    _, cust = _rows(sf_dir, "customer", "c_custkey")
    lines = []
    for r in cust:
        seg = "" if r["c_custkey"] % 7 == 0 else r["c_mktsegment"]
        lines.append(
            f"{r['c_custkey']}|{r['c_name']}|{r['c_nationkey']}|"
            f"{r['c_acctbal']:.2f}|{seg}"
        )
    _write_atomic(os.path.join(out, "customer.psv"), "\n".join(lines) + "\n")

    _, parts = _rows(sf_dir, "part", "p_partkey")
    plines = ["p_partkey,p_brand,p_type,p_size,p_retailprice"]
    for r in parts:
        assert "," not in r["p_brand"] and "," not in r["p_type"]
        plines.append(
            f"{r['p_partkey']},{r['p_brand']},{r['p_type']},"
            f"{r['p_size']},{r['p_retailprice']:.2f}"
        )
    _write_atomic(os.path.join(out, "part.csv"), "\n".join(plines) + "\n")

    _, supp = _rows(sf_dir, "supplier", "s_suppkey")
    flines = []
    for r in supp:
        k = r["s_suppkey"]
        pts = f"20240101-{k:06d}"  # 15 chars
        cmp_line = (
            pts
            + "CMP"
            + f"{r['s_name']:<60.60}"
            + f"{k:010d}"
            + ("INAC" if k % 11 == 0 else "ACTV")
            + f"{k % 20:02d}"
            + ("    " if k % 5 == 0 else _SP_RATINGS[k % 4])
            + f"{1950 + k % 70}0115"
        )
        assert len(cmp_line) == 106 and "|" not in cmp_line
        flines.append(cmp_line)
        if k % 2 == 0:  # interleave FIN records the CMP scan must skip
            fin_line = pts + "FIN" + f"{2020 + k % 5:04d}" + f"{k % 4 + 1:01d}"
            assert "|" not in fin_line
            flines.append(fin_line)
    _write_atomic(os.path.join(out, "finwire.txt"), "\n".join(flines) + "\n")

    _write_atomic(
        os.path.join(out, "BatchDate.txt"), f"# extract metadata\n{BATCH_DATE}\n"
    )
    return out


def make_debezium_sidecar(sf_dir: str) -> str:
    """changes.debezium.jsonl — a raw-Connect-envelope Debezium changelog
    derived from the events table (same op distribution as
    _derive_change_events: %20==0 delete, %3==0 update, every 7th
    insert arrives as a snapshot 'r' read). Two malformed lines
    exercise the reader's quarantine side-output; DuckDB's oracle read
    skips them via ignore_errors. Separate from make_sidecars so the
    CSV/fixed-width queries don't pay this 10k-line serialization."""
    out = sidecar_dir(sf_dir)
    os.makedirs(out, exist_ok=True)
    import datetime as _dt
    import json as _json

    _, evs = _rows(sf_dir, "events", "event_id")
    jlines = []
    for r in evs:
        eid = r["event_id"]
        if eid % 20 == 0:
            op = "d"
        elif eid % 3 == 0:
            op = "u"
        else:
            op = "r" if eid % 7 == 0 else "c"
        row = {
            "conv_id": f"conv-{r['user_id']:06d}",
            "turn_idx": eid % 50,
            "role": ["user", "assistant", "tool"][eid % 3],
            "text": f"text u{r['user_id']} t{eid % 50} e{eid}",
        }
        # pyarrow hands back naive datetimes; pin UTC so the fixture is
        # byte-identical regardless of the generating host's TZ
        ts_ms = int(r["ts"].replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
        payload = {
            "op": op,
            "ts_ms": ts_ms,
            "before": (
                {"conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                 "role": None, "text": None}
                if op == "d"
                else None
            ),
            "after": None if op == "d" else row,
            "source": {"lsn": eid, "pos": None},
        }
        jlines.append(_json.dumps({"payload": payload}, sort_keys=True))
    jlines.insert(3, '{"payload": {"op": "x", "ts_ms": 1}}')  # unknown op
    jlines.insert(9, "{not json at all")  # unparseable
    _write_atomic(
        os.path.join(out, "changes.debezium.jsonl"), "\n".join(jlines) + "\n"
    )
    return os.path.join(out, "changes.debezium.jsonl")

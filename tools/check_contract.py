"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, every cell
stringified). Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from tpc_di_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"pass": False, "error": str(e)[:200]}
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"OK?  {name}: rows={len(srows)} (no oracle, rows-only)")
            results[name] = {"pass": None, "rows": len(srows), "note": "no oracle"}
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"pass": False, "error": str(e)[:200]}
            failures += 1
            continue
        secs = time.monotonic() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            hs, hd = value_hash(srows, scols), value_hash(drows, dcols)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
                # Show a few differing lines for debugging.
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = {"|".join(norm_cell(r[i]) for i in order_s) for r in srows}
                set_d = {"|".join(norm_cell(r[i]) for i in order_d) for r in drows}
                for line in list(set_s - set_d)[:3]:
                    problems.append(f"  spark-only: {line[:160]}")
                for line in list(set_d - set_s)[:3]:
                    problems.append(f"  duck-only:  {line[:160]}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"pass": False, "problems": problems[:4]}
        else:
            print(f"PASS {name}: rows={len(srows)} ({secs:.1f}s)")
            results[name] = {
                "pass": True,
                "rows": len(srows),
                "value_hash": value_hash(srows, scols),
                "secs": round(secs, 1),
            }
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "queries_checked": len(results),
                    "failures": failures,
                    "results": results,
                },
                f,
                indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Time every ORACLE_SQL in plain DuckDB — the audit CLAUDE.md/PERF.md
prescribe for the CTE-inlining trap (DuckDB 1.0 re-evaluates a plain CTE
once per reference, multiplicative through levels; a chain that quietly
re-runs an 8.7M-row join dozens of times shows up here as a >8 s oracle,
long before it shows up as a disk-full check_correctness run).

Usage:
    python tools/audit_oracle_times.py [--sf DIR] [--flag SECONDS] [name ...]

Defaults: sf0.1 (the scale where inlining blowups become visible but a
healthy oracle still finishes in seconds), flag threshold 8 s.  Prints
one line per oracle sorted slowest-first, flags offenders, exits 1 if
any oracle exceeds the threshold (so it can gate CI).  DuckDB thread
count is capped so the audit can share a host with Spark work.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--flag", type=float, default=8.0)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument(
        "--write-cache",
        action="store_true",
        help="write the slowest-oracle cache (tools/oracle_slow_list.json) "
        "that tools/self_audit.py re-times each round; run this after a "
        "FULL sweep whenever oracles are added or rewritten",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as contract

    oracles = contract.oracle_sql()
    targets = args.names or sorted(oracles)

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={args.threads}")
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    rows = []
    for name in targets:
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            err = None
        except Exception as exc:  # noqa: BLE001
            n, err = -1, str(exc)[:200]
        rows.append((time.time() - t0, name, n, err))

    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > args.flag or r[3]]
    for dt, name, n, err in rows:
        mark = "FLAG" if (dt > args.flag or err) else "ok  "
        extra = f" ERROR: {err}" if err else ""
        print(f"{mark} {dt:7.2f}s {name:40s} rows={n}{extra}")
    print(f"\n{len(rows)} oracles, {len(flagged)} flagged (> {args.flag}s or error)")
    if args.write_cache:
        import json

        cache = {
            "note": "slowest DuckDB oracles at sf0.1; self_audit.py re-times "
            "these and flags > threshold. Regenerate with "
            "`python tools/audit_oracle_times.py --write-cache` after a "
            "full sweep.",
            "sf": args.sf,
            "threshold_sec": args.flag,
            "n_timed_full_sweep": len(rows),
            "slowest": [
                {"name": name, "sec_at_cache_time": round(dt, 2)}
                for dt, name, n, err in rows[:15]
            ],
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle_slow_list.json")
        with open(path, "w") as f:
            json.dump(cache, f, indent=1)
        print(f"wrote {path}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())

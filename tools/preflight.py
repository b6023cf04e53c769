#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [q1,q2,...]

Reads each <verifyOutDir>/<name>/ parquet result produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB (tables = views over
<sfDir>/*.parquet), and diffs: schema (sorted column names), row count, and
values (rows sorted, columns sorted by name). Reports exact equality and,
for float columns, the max abs diff so near-misses are visible.

A missing result dir is a FAILURE (a query that crashed before writing, or
an oracle/result name mismatch, must not pass the gate silently). It only
counts as "not run" when a subset is explicitly signaled — the optional
third argument or the SPARK_GRAFT_ONLY env var names the queries that were
actually run, and only queries OUTSIDE that set may be absent.

This is builder-side tooling only — the engine library has no Python.
"""
import json, math, os, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def sort_key(row):
    # None-safe, mixed-type-safe deterministic ordering
    return tuple((v is None, str(type(v)), repr(v)) for v in row)


def main(sf_dir: str, out_dir: str, only: str | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    only = only or os.environ.get("SPARK_GRAFT_ONLY")
    ran = ({q.strip() for q in only.split(",") if q.strip()}
           if only else None)
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            if ran is not None and name not in ran:
                # explicitly-signaled subset run: queries outside the
                # subset were legitimately not run
                n_skip += 1
                continue
            # FULL-battery run (or a named query missing its dir): a
            # query that crashed before writing must fail the gate
            print(f"FAIL {name}: no result dir {res_dir}")
            n_fail += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            ref = con.sql(sql)
            mcols = sorted(mine.columns)
            rcols = sorted(ref.columns)
            if [c.lower() for c in mcols] != [c.lower() for c in rcols]:
                print(f"FAIL {name}: cols mine={mcols} oracle={rcols}")
                n_fail += 1
                continue
            mrows = sorted([tuple(norm(v) for v in r)
                            for r in mine.select(", ".join(f'"{c}"' for c in mcols)).fetchall()],
                           key=sort_key)
            rrows = sorted([tuple(norm(v) for v in r)
                            for r in ref.select(", ".join(f'"{c}"' for c in rcols)).fetchall()],
                           key=sort_key)
            if len(mrows) != len(rrows):
                print(f"FAIL {name}: rows mine={len(mrows)} oracle={len(rrows)}")
                n_fail += 1
                continue
            if mrows == rrows:
                print(f"PASS {name}: {len(mrows)} rows exact")
                n_pass += 1
                continue
            # find worst diff
            bad = 0
            worst = 0.0
            example = None
            for a, b in zip(mrows, rrows):
                if a != b:
                    bad += 1
                    if example is None:
                        example = (a, b)
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            worst = max(worst, abs(x - y))
            print(f"FAIL {name}: {bad}/{len(mrows)} rows differ, "
                  f"max_float_diff={worst:.3e}\n  mine:   {example[0]}\n  oracle: {example[1]}")
            n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    skipped = f", {n_skip} not run" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

#!/usr/bin/env python3
"""Time DuckDB sequentially over an oracle_sql.json battery.

Usage: python3 tools/duck_time.py <sfDir> <verifyOutDir>

Builder-side benchmarking aid (the BASELINE.md protocol): runs every
oracle query once sequentially in a fresh in-memory DuckDB with views
over <sfDir>/*.parquet, prints per-query seconds and the total. Run it
in a window that does NOT overlap a Spark bench so the numbers are
comparable.
"""
import json, sys, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> None:
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.is_dir():
            # Spark-written table (ScaleData corpora): directory of parts
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = {}
    t0 = time.monotonic()
    for name in sorted(oracle):
        q0 = time.monotonic()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = time.monotonic() - q0
        except Exception as e:  # noqa: BLE001 - report and continue
            times[name] = -1.0
            print(f"ERR {name}: {e}")
    total = time.monotonic() - t0
    for k, v in sorted(times.items(), key=lambda x: -x[1])[:10]:
        print(f"{k}: {v:.2f}s")
    errs = sum(1 for v in times.values() if v < 0)
    print(json.dumps({"duckdb_sequential_total_sec": round(total, 2),
                      "n_queries": len(times), "errors": errs}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

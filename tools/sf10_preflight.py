#!/usr/bin/env python3
"""Chunked parallel driver for the FULL-battery sf10 correctness gate
(r9 judge ask #2) — builder-side tooling.

One preflight process over all 159 oracles at sf10 is hours of
single-stream DuckDB (recursive-CTE components, BPE CTEs, posting
self-joins dominate). This driver splits the battery into N worker
processes, each running `tools/preflight.py` in memory-flat SQL-compare
mode (PREFLIGHT_COMPARE=sql: counts + symmetric EXCEPT ALL inside
DuckDB — 375M oracle rows never reach Python) with capped threads and
memory, then merges the per-chunk verdicts into one
CORRECTNESS-shaped artifact.

Chunks are GREEDY-BALANCED by each query's measured DuckDB cost at
sf0.1 (bench_full.json's queries_duck map, the best available
predictor), not round-robin — the heavy tail (dedup_components,
bpe_*, *_pairs) would otherwise serialize in one unlucky chunk.

Per the preflight contract, a chunk worker must only see the result
dirs of ITS queries (preflight compares every dir present), so each
chunk gets a symlink farm.

Usage:
  python3 tools/sf10_preflight.py <sfDir> <verifyOutDir> <artifact.json>
      [n_workers] [threads_per_worker] [memlimit_per_worker]
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def chunks_balanced(names, costs, n):
    bins = [[] for _ in range(n)]
    load = [0.0] * n
    for name in sorted(names, key=lambda q: -costs.get(q, 0.01)):
        i = load.index(min(load))
        bins[i].append(name)
        load[i] += max(costs.get(name, 0.01), 0.01)
    return [b for b in bins if b], load


def main():
    sf_dir, out_dir, artifact = sys.argv[1:4]
    n_workers = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    threads = sys.argv[5] if len(sys.argv) > 5 else "6"
    memlimit = sys.argv[6] if len(sys.argv) > 6 else "16GB"
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    names = sorted(oracle)
    # SF10_EXCLUDE=a,b: keep named queries OUT of the worker farm (they
    # run solo with their own memory/band budget — e.g. triangle_count
    # banded — and their PREFLIGHT_JSON verdicts are merged into the
    # artifact afterwards by the caller)
    excl = {q.strip() for q in os.environ.get("SF10_EXCLUDE", "").split(",")
            if q.strip()}
    if excl:
        print(f"farm excludes (run solo, merge later): {sorted(excl)}")
        names = [n for n in names if n not in excl]
    # cost prior: sf0.1 duck costs from the committed full distribution
    try:
        costs = json.loads((REPO / "bench_full.json").read_text())\
            .get("queries_duck", {})
    except Exception:  # noqa: BLE001
        costs = {}
    bins, load = chunks_balanced(names, costs, n_workers)
    print(f"{len(names)} queries -> {len(bins)} chunks, "
          f"predicted loads {[round(x, 1) for x in load]}")

    work = Path("/tmp/r10/pf_chunks")
    procs = []
    for i, b in enumerate(bins):
        cdir = work / f"c{i}"
        cdir.mkdir(parents=True, exist_ok=True)
        for entry in cdir.iterdir():
            if entry.is_symlink():
                entry.unlink()
        (cdir / "oracle_sql.json").unlink(missing_ok=True)
        os.symlink(out / "oracle_sql.json", cdir / "oracle_sql.json")
        missing = []
        for q in b:
            src = out / q
            if src.exists():
                os.symlink(src, cdir / q)
            else:
                missing.append(q)
        if missing:
            # leave them out of the symlink farm BUT run without ONLY
            # so preflight records the missing dir as a FAIL — a query
            # that crashed in Verify must not pass silently. The chunk
            # still needs oracle entries restricted to its queries:
            # write a chunk-local oracle_sql.json instead of a symlink.
            (cdir / "oracle_sql.json").unlink()
            (cdir / "oracle_sql.json").write_text(
                json.dumps({q: oracle[q] for q in b}))
            print(f"chunk {i}: {len(missing)} missing result dirs "
                  f"(will FAIL): {missing}")
        else:
            (cdir / "oracle_sql.json").unlink()
            (cdir / "oracle_sql.json").write_text(
                json.dumps({q: oracle[q] for q in b}))
        env = dict(os.environ,
                   PREFLIGHT_COMPARE="sql",
                   PREFLIGHT_JSON=str(work / f"c{i}.json"),
                   PREFLIGHT_THREADS=threads,
                   PREFLIGHT_MEMLIMIT=memlimit)
        env.pop("SPARK_GRAFT_ONLY", None)
        log = open(work / f"c{i}.log", "w")
        procs.append((i, subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "preflight.py"),
             sf_dir, str(cdir)],
            stdout=log, stderr=subprocess.STDOUT, env=env)))
    rc = 0
    for i, p in procs:
        r = p.wait()
        print(f"chunk {i}: exit {r}")
        rc = rc or r
    merged = {}
    for i, _ in procs:
        merged.update(json.loads((work / f"c{i}.json").read_text()))
    Path(artifact).write_text(json.dumps(merged, indent=1, sort_keys=True))
    n_pass = sum(1 for v in merged.values()
                 if v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match"))
    print(f"== sf10 battery: {n_pass}/{len(merged)} green -> {artifact} ==")
    return 0 if (rc == 0 and n_pass == len(merged) == len(names)) else 1


if __name__ == "__main__":
    sys.exit(main())

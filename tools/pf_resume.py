#!/usr/bin/env python3
"""Crash-isolated resume for a chunked preflight run (builder-side).

The chunked sf10 run showed DuckDB workers can die hard (abort/OOM)
mid-chunk, losing the whole chunk's remaining queries and leaving a
stale artifact. This driver re-runs ONLY the queries that have no
verdict yet, one preflight SUBPROCESS PER QUERY (a crash marks that
query and moves on), with bounded parallelism and a per-query
timeout.

Usage:
  python3 tools/pf_resume.py <sfDir> <verifyOutDir> <workDir> <merged.json>
      [parallel] [threads] [memlimit] [timeout_sec]

Reads existing per-chunk logs' PASS lines in <workDir> (c*.log) plus
any prior <workDir>/q_*.json verdicts; writes per-query verdicts to
<workDir>/q_<name>.json and the merged artifact at the end.
"""
import json
import os
import re
import subprocess
import sys
import threading
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    sf_dir, out_dir, work_dir, merged_path = sys.argv[1:5]
    par = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    threads = sys.argv[6] if len(sys.argv) > 6 else "8"
    memlimit = sys.argv[7] if len(sys.argv) > 7 else "24GB"
    timeout = int(sys.argv[8]) if len(sys.argv) > 8 else 5400
    out = Path(out_dir)
    work = Path(work_dir)
    work.mkdir(parents=True, exist_ok=True)
    oracle = json.loads((out / "oracle_sql.json").read_text())

    # verdicts already in hand: chunk-run PASS lines + prior per-query runs
    done: dict[str, dict] = {}
    for log in work.glob("c*.log"):
        for m in re.finditer(r"^PASS (\w+): (\d+) rows exact", log.read_text(),
                             re.M):
            done[m.group(1)] = {
                "rows_match": True, "schema_match": True, "hash_match": True,
                "spark_rows": int(m.group(2)),
                "oracle_rows": int(m.group(2)), "err": None}
    for qj in work.glob("q_*.json"):
        done.update(json.loads(qj.read_text()))
    # chunk-run FAILs re-run too (a fail may have been a crashed sibling)
    todo = sorted(q for q in oracle if q not in done)
    print(f"{len(done)} verdicts in hand, {len(todo)} to (re)run")

    lock = threading.Lock()

    def run_one(q):
        qdir = work / f"qd_{q}"
        qdir.mkdir(exist_ok=True)
        link = qdir / q
        if link.is_symlink():
            link.unlink()
        if (out / q).exists():
            os.symlink(out / q, link)
        (qdir / "oracle_sql.json").write_text(json.dumps({q: oracle[q]}))
        env = dict(os.environ, PREFLIGHT_COMPARE="sql",
                   PREFLIGHT_JSON=str(work / f"q_{q}.json"),
                   PREFLIGHT_THREADS=threads,
                   PREFLIGHT_MEMLIMIT=memlimit,
                   PREFLIGHT_TEMPLIMIT=os.environ.get("PF_TEMPLIMIT", "10GB"))
        env.pop("SPARK_GRAFT_ONLY", None)
        try:
            r = subprocess.run(
                [sys.executable, str(REPO / "tools" / "preflight.py"),
                 sf_dir, str(qdir)],
                capture_output=True, text=True, env=env, timeout=timeout)
            verdict = json.loads((work / f"q_{q}.json").read_text()) \
                if (work / f"q_{q}.json").exists() else \
                {q: {"rows_match": False, "schema_match": False,
                     "hash_match": False, "spark_rows": None,
                     "oracle_rows": None,
                     "err": f"worker exit {r.returncode}, no verdict "
                            f"(crash): {r.stdout[-200:]}"}}
        except subprocess.TimeoutExpired:
            verdict = {q: {"rows_match": False, "schema_match": False,
                           "hash_match": False, "spark_rows": None,
                           "oracle_rows": None,
                           "err": f"oracle timeout > {timeout}s"}}
            (work / f"q_{q}.json").write_text(json.dumps(verdict))
        with lock:
            done.update(verdict)
            v = verdict[q]
            ok = v.get("hash_match")
            print(f"{'PASS' if ok else 'FAIL'} {q}"
                  f"{'' if ok else ' — ' + str(v.get('err'))}", flush=True)

    sem = threading.Semaphore(par)
    ts = []

    def worker(q):
        with sem:
            try:
                run_one(q)
            except Exception as e:  # noqa: BLE001 — a thread death would
                # silently wedge the pool; record and continue instead
                with lock:
                    done[q] = {"rows_match": False, "schema_match": False,
                               "hash_match": False, "spark_rows": None,
                               "oracle_rows": None,
                               "err": f"driver {type(e).__name__}: {e}"}
                    print(f"FAIL {q} — driver {type(e).__name__}: {e}",
                          flush=True)

    for q in todo:
        t = threading.Thread(target=worker, args=(q,))
        t.start()
        ts.append(t)
    for t in ts:
        t.join()
    Path(merged_path).write_text(json.dumps(done, indent=1, sort_keys=True))
    n_pass = sum(1 for v in done.values() if v.get("hash_match"))
    print(f"== sf10 battery: {n_pass}/{len(done)} green "
          f"({len(oracle)} total) -> {merged_path} ==")
    return 0 if n_pass == len(oracle) == len(done) else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Self-test of preflight's cross-round bench-delta gate (builder-side
tooling test, runnable standalone: `python3 tools/test_preflight_gate.py`).

Covers the r9 judge's ask #4 contract:
  1. identical-protocol artifacts with only window noise -> exit 0;
  2. a deliberately-injected per-query regression (3x spark growth,
     duck flat, above the 2.5 s materiality floor) -> exit 1 and the
     query named;
  3. a sub-floor flip (0.4 s -> 0.9 s) stays green (scheduler noise,
     not a regression worth a red gate);
  4. the unconditional ceiling fires with no baseline at all.
"""
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from preflight import bench_delta_gate  # noqa: E402


def art(path: Path, spark: dict, duck: dict) -> str:
    path.write_text(json.dumps(
        {"queries_sequential": spark, "queries_duck": duck}))
    return str(path)


def main() -> int:
    tmp = Path(tempfile.mkdtemp(prefix="preflight_gate_test"))
    prev = art(tmp / "prev.json",
               {"q_big": 3.0, "q_small": 0.4, "q_mid": 1.2},
               {"q_big": 1.0, "q_small": 0.3, "q_mid": 0.8})

    # 1. noise-only window (±30% both sides) is green
    cur_ok = art(tmp / "cur_ok.json",
                 {"q_big": 3.6, "q_small": 0.5, "q_mid": 1.0},
                 {"q_big": 0.9, "q_small": 0.35, "q_mid": 0.9})
    assert bench_delta_gate(cur_ok, prev) == 0, "noise window must pass"

    # 2. injected regression: q_big 3.0 -> 9.0 s, duck flat -> caught
    cur_bad = art(tmp / "cur_bad.json",
                  {"q_big": 9.0, "q_small": 0.4, "q_mid": 1.2},
                  {"q_big": 1.0, "q_small": 0.3, "q_mid": 0.8})
    assert bench_delta_gate(cur_bad, prev) == 1, "3x regression must flag"

    # 3. sub-floor flip stays green (0.4 -> 0.9 s is noise territory)
    cur_small = art(tmp / "cur_small.json",
                    {"q_big": 3.0, "q_small": 0.9, "q_mid": 1.2},
                    {"q_big": 1.0, "q_small": 0.3, "q_mid": 0.8})
    assert bench_delta_gate(cur_small, prev) == 0, \
        "sub-floor flip must not flag"

    # 4. ceiling fires even for a query with no baseline
    cur_ceil = art(tmp / "cur_ceil.json",
                   {"q_new": 31.0}, {"q_new": 1.0})
    assert bench_delta_gate(cur_ceil, prev) == 1, "ceiling must flag"

    # 5. WARN tier (r10 margin note): a simhash-shaped regression —
    #    1.48x normalized growth, +0.72 s absolute, below the 2.5 s
    #    hard floor — must PRINT a warning but stay exit 0
    import contextlib
    import io
    prev_sim = art(tmp / "prev_sim.json",
                   {"simhash": 1.50}, {"simhash": 5.49})
    cur_sim = art(tmp / "cur_sim.json",
                  {"simhash": 2.22}, {"simhash": 5.49})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_sim, prev_sim)
    assert rc == 0, "warn-tier regression must not turn the gate red"
    assert "WARN simhash" in buf.getvalue(), \
        f"warn tier must name the query, got: {buf.getvalue()!r}"

    # 6. warn tier needs BOTH conditions: +0.4 s at 1.4x stays silent
    prev_q = art(tmp / "prev_q.json", {"q": 1.0}, {"q": 1.0})
    cur_q = art(tmp / "cur_q.json", {"q": 1.4}, {"q": 1.0})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_q, prev_q)
    assert rc == 0 and "WARN" not in buf.getvalue(), \
        "sub-delta growth must not warn"

    # 7. NEAREST-DUCK PAIRING (r12 ask #4): among two candidates the
    #    gate must pick the one whose duck total is closest to the
    #    current window's, and NAME it
    def art_tot(path: Path, spark: dict, duck: dict, tot: float,
                **extra) -> str:
        body = {"queries_sequential": spark, "queries_duck": duck,
                "duck_sequential_total_sec": tot}
        body.update(extra)
        path.write_text(json.dumps(body))
        return str(path)
    cur_w = art_tot(tmp / "cur_w.json", {"q_big": 3.0}, {"q_big": 1.0}, 80.0)
    near = art_tot(tmp / "near.json", {"q_big": 3.0}, {"q_big": 1.0}, 84.0)
    far = art_tot(tmp / "far.json", {"q_big": 0.5}, {"q_big": 1.0}, 60.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_w, f"{far},{near}")
    assert rc == 0 and "paired against" in buf.getvalue() \
        and "near.json" in buf.getvalue().splitlines()[0], \
        f"nearest-duck candidate must win, got: {buf.getvalue()!r}"

    # 8. cold-vs-warmed pairing refused (exit 2), window class named
    cold = art_tot(tmp / "cold.json", {"q_big": 3.0}, {"q_big": 1.0},
                   80.0, window_state="cold")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_w, cold)
    assert rc == 2 and "cold" in buf.getvalue(), \
        f"cold pairing must refuse, got: {buf.getvalue()!r}"

    # 9. windows >1.35x apart refused even as the only candidate
    vfar = art_tot(tmp / "vfar.json", {"q_big": 3.0}, {"q_big": 1.0}, 200.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_w, vfar)
    assert rc == 2 and "REFUSED" in buf.getvalue(), \
        f"far window must refuse, got: {buf.getvalue()!r}"

    # 10. warmup_ok=false on the baseline side is skipped (unknown class)
    badw = art_tot(tmp / "badw.json", {"q_big": 3.0}, {"q_big": 1.0},
                   80.0, warmup_ok=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_w, badw)
    assert rc == 2 and "warmup_ok=false" in buf.getvalue(), \
        f"unknown-class window must be skipped, got: {buf.getvalue()!r}"

    # 11. STREAM FAMILY AS ONE UNIT (r14 ask #3): pre-r15 attribution
    #     (whole drain on the absorber) and r15+ attribution (drain in
    #     stream_generation_sec, absorber near-zero) must pair as the
    #     SAME family total — no flag, no warn — and per-member entries
    #     must not be ratio-paired individually (the absorber's 7.3->0.2
    #     would otherwise read as a huge per-query move).
    prev_st = art_tot(tmp / "prev_st.json",
                      {"stream_a": 7.3, "stream_b": 0.2, "q_big": 3.0},
                      {"stream_a": 0.5, "stream_b": 0.5, "q_big": 1.0},
                      80.0)
    cur_st = art_tot(tmp / "cur_st.json",
                     {"stream_a": 0.2, "stream_b": 0.3, "q_big": 3.0},
                     {"stream_a": 0.5, "stream_b": 0.5, "q_big": 1.0},
                     82.0, stream_generation_sec=7.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_st, prev_st)
    out = buf.getvalue()
    assert rc == 0 and "FLAG" not in out and "WARN" not in out         and "2 ratio-paired" in out,         f"stream family must collapse to one stable unit, got: {out!r}"

    # 12. a real family-level regression still flags through the unit
    cur_bad = art_tot(tmp / "cur_bad.json",
                      {"stream_a": 3.0, "stream_b": 3.0, "q_big": 3.0},
                      {"stream_a": 0.5, "stream_b": 0.5, "q_big": 1.0},
                      82.0, stream_generation_sec=14.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench_delta_gate(cur_bad, prev_st)
    assert rc == 1 and "stream_family" in buf.getvalue(),         f"family-level regression must flag, got: {buf.getvalue()!r}"

    print("test_preflight_gate: 12/12 assertions green")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/bin/bash
# Sample the filesystem's used bytes every N seconds while a command
# runs; report the PEAK used-delta over the pre-run baseline (the
# "peak scratch" number in BASELINE.md chain rows).
# Usage: tools/scratch_watch.sh [-i <sec>] -- <command...>
INTERVAL=5
if [[ "$1" == "-i" ]]; then INTERVAL="$2"; shift 2; fi
[[ "$1" == "--" ]] && shift
BASE=$(df --output=used -B1 /tmp | tail -1)
PEAKFILE=$(mktemp)
echo 0 > "$PEAKFILE"
( while true; do
    NOW=$(df --output=used -B1 /tmp | tail -1)
    D=$((NOW - BASE))
    P=$(cat "$PEAKFILE")
    [[ $D -gt $P ]] && echo $D > "$PEAKFILE"
    sleep "$INTERVAL"
  done ) &
WATCH=$!
START=$(date +%s)
"$@"
RC=$?
END=$(date +%s)
kill $WATCH 2>/dev/null
PEAK=$(cat "$PEAKFILE"); rm -f "$PEAKFILE"
echo "[scratch_watch] wall_s=$((END-START)) peak_scratch_bytes=$PEAK peak_scratch_gb=$(python3 -c "print(round($PEAK/2**30,2))") rc=$RC"
exit $RC

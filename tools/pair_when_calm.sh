#!/bin/bash
# Run tools/bench_pair.py only in a steal-calm window, retrying until
# the pair's own graft-side steal sample is under a threshold.
# Usage: pair_when_calm.sh <max_attempts> <graft_steal_budget_s> <log> -- <bench_pair args...>
set -u
ATTEMPTS=$1; BUDGET=$2; LOG=$3; shift 3
[ "$1" = "--" ] && shift
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for i in $(seq 1 "$ATTEMPTS"); do
  # wait for 2 consecutive calm 30s windows (< 30 jiffies each)
  calm=0
  while [ $calm -lt 2 ]; do
    s0=$(steal); sleep 30; s1=$(steal)
    d=$((s1 - s0))
    if [ "$d" -lt 30 ]; then calm=$((calm + 1)); else calm=0; fi
    echo "[calm-gate] window steal=$d calm=$calm" >> "$LOG"
  done
  echo "[calm-gate] attempt $i launching" >> "$LOG"
  python3 tools/bench_pair.py "$@" >> "$LOG" 2>&1
  line=$(grep '"graft_s"' "$LOG" | tail -1)
  gsteal=$(echo "$line" | python3 -c 'import json,sys; print(json.loads(sys.stdin.read())["steal"]["graft_s"])')
  ok=$(python3 -c "print(1 if $gsteal <= $BUDGET else 0)")
  echo "[calm-gate] attempt $i graft_steal=$gsteal ok=$ok" >> "$LOG"
  if [ "$ok" = "1" ]; then echo "CLEAN: $line"; exit 0; fi
done
echo "EXHAUSTED: $line"
exit 1

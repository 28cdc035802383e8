#!/bin/bash
# Run tools/bench_pair.py only in a steal-calm window, retrying until
# the pair's own graft-side steal sample is under a threshold.
#
# The budget is either absolute seconds ("0.5") or PROPORTIONAL
# ("2%" = graft-side steal must stay under 2% of the graft run's own
# wall clock). Proportional is the right gate for long runs: the 30 s
# pre-gate windows all read calm before every round-18 core-1000x
# attempt and the 90-250 s runs then ate bursts anyway — the
# measurement that matters is the steal DURING the run, scaled to how
# long the run was.
# Usage: pair_when_calm.sh <max_attempts> <budget_s|budget%> <log> -- <bench_pair args...>
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
  ok=$(echo "$line" | BUDGET="$BUDGET" python3 -c '
import json, os, sys
s = json.loads(sys.stdin.read())["steal"]
b = os.environ["BUDGET"]
if b.endswith("%"):
    limit = float(b[:-1]) / 100.0 * s.get("graft_wall_s", 0)
else:
    limit = float(b)
print(1 if s["graft_s"] <= limit else 0)')
  gsteal=$(echo "$line" | python3 -c 'import json,sys; print(json.loads(sys.stdin.read())["steal"]["graft_s"])')
  echo "[calm-gate] attempt $i graft_steal=$gsteal budget=$BUDGET ok=$ok" >> "$LOG"
  if [ "$ok" = "1" ]; then echo "CLEAN: $line"; exit 0; fi
done
echo "EXHAUSTED: $line"
exit 1

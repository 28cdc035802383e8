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
line=""
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
  # capture THIS attempt's stdout separately: grepping the cumulative
  # log re-evaluates the PREVIOUS attempt's summary when the current
  # bench_pair.py crashes before printing one
  out=$(mktemp /tmp/pair_attempt.XXXXXX)
  python3 tools/bench_pair.py "$@" > "$out" 2>> "$LOG"
  cat "$out" >> "$LOG"
  line=$(grep '"graft_s"' "$out" | tail -1)
  rm -f "$out"
  if [ -z "$line" ]; then
    echo "[calm-gate] attempt $i crashed (no summary) — rejected" >> "$LOG"
    continue
  fi
  # BOTH sides must be calm: a storm that lands on the ORACLE side
  # inflates the DuckDB column and fabricates a graft win the repo
  # would then commit (observed round 20: a graft-clean headline
  # attempt read 0.92x only because the oracle ate 49 s of steal on a
  # 48 s wall). Proportional budgets apply per side, each against its
  # own wall. An ABORTED attempt (early graft-steal abort: no duckdb
  # fields, nothing written) always fails the gate, independent of the
  # thresholds — d_ok must never pass vacuously on a half pair.
  ok=$(echo "$line" | BUDGET="$BUDGET" python3 -c '
import json, os, sys
j = json.loads(sys.stdin.read())
if "aborted" in j:
    print(0)
    sys.exit()
s = j["steal"]
b = os.environ["BUDGET"]
def lim(wall):
    if b.endswith("%"):
        return float(b[:-1]) / 100.0 * wall
    return float(b)
g_ok = s["graft_s"] <= lim(s.get("graft_wall_s", 0))
d_ok = (s.get("duckdb_s") is not None
        and s["duckdb_s"] <= lim(s.get("duckdb_wall_s", 0)))
print(1 if g_ok and d_ok else 0)')
  gsteal=$(echo "$line" | python3 -c 'import json,sys; s=json.loads(sys.stdin.read())["steal"]; print(s["graft_s"], s.get("duckdb_s", "-"))')
  echo "[calm-gate] attempt $i graft/duckdb_steal=$gsteal budget=$BUDGET ok=$ok" >> "$LOG"
  if [ "$ok" = "1" ]; then echo "CLEAN: $line"; exit 0; fi
done
echo "EXHAUSTED: $line"
exit 1

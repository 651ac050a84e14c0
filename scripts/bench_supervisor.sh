#!/bin/bash
# Restart-on-wedge supervisor for the on-chip benchmark cache build.
# bench.py's watchdog exits 17 on a stalled device call; part-checkpoints
# make restarts cheap. Writes the final JSON to bench_sup_out.json.
cd /root/repo
ROWS="${1:-hard_8k,hard_32k,long_128k}"
shift || true
for i in $(seq 1 12); do
  echo "[supervisor] attempt $i rows=$ROWS extra=$* $(date -u +%F' '%T)" >> bench_run.log
  python bench.py --train --rows "$ROWS" "$@" > bench_sup_out.json 2>> bench_run.log
  rc=$?
  echo "[supervisor] attempt $i exit=$rc $(date -u +%F' '%T)" >> bench_run.log
  [ $rc -eq 0 ] && break
  sleep 15
done

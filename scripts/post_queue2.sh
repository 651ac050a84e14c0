#!/bin/bash
# Wait for post_measure_queue (PID $1), then re-measure the int8-KV 32k row
# with the lane-major scale layout fix.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
bash scripts/bench_supervisor.sh hard_32k --kv-quant int8 --fresh-rows

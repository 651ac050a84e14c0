#!/bin/bash
# Final TPU measurement batch: wait for post_queue3 (PID $1), then
# 1. fresh bf16 headline re-measure (adds the T=1 row fields),
# 2. warm-pass serving throughput bench.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
bash scripts/bench_supervisor.sh hard_32k --fresh-rows
timeout 3000 python scripts/bench_serve.py --slots 4 --requests 12 \
  > bench_serve_r2.log 2>&1

#!/bin/bash
# Post-distill measurement batch for the 32k north-star row. Each phase is
# a supervised bench invocation (restart-on-wedge); row results land in
# .bench_cache/row_*.json so the driver's end-of-round bench run is a pure
# cached-row emit. Run AFTER the draft cache exists.
set -x
cd /root/repo
# 1. chunked rows (hard_32k re-measures against the retrained pair;
#    easy_8k gets a row cache so the driver's default run skips it)
bash scripts/bench_supervisor.sh easy_8k,hard_8k,hard_32k
# 2. pallas rows (window chunk-skip path) — separate row cache key
bash scripts/bench_supervisor.sh easy_8k,hard_8k,hard_32k --attn pallas
# 3. deeper tree at 32k under pallas (depth 6: max accept 7 — rounds are
#    bandwidth-bound, extra nodes are nearly free)
bash scripts/bench_supervisor.sh hard_32k --attn pallas --tree-shape 4,16,16,16,16,16

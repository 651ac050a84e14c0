#!/bin/bash
# Second round-3 measurement queue: wait for the long-row supervisor (PID
# $1), then (a) bit-exact dual-arm forensics for the hard_8k pallas
# lossless trip, (b) the 32k tree profile with the fixed (no captured
# constants) profile script.
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done

timeout 3600 python scripts/bitdiff_arms.py --row hard_8k --attn pallas \
    --gen 256 > bitdiff_hard8k_pallas.log 2>&1

timeout 2400 python scripts/profile_tree.py --row hard_32k --ctx 32768 \
    --attn pallas --tree-shape 4,16,16,16,16,16 --window 12288 \
    > profile_tree_32k_r3.log 2>&1 || true

echo "[post_queue_r3b] done $(date -u +%F' '%T)" >> bench_run.log

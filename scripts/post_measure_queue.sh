#!/bin/bash
# Post-measurement TPU queue: wait for the hard_32k re-measure pipeline
# (PID $1) to exit, then profile the tree round at 32k (headline config:
# pallas, depth-6 tree, window 12288) and benchmark serving throughput.
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
timeout 2400 python scripts/profile_tree.py --row hard_32k --ctx 32768 \
  --attn pallas --tree-shape 4,16,16,16,16,16 --window 12288 \
  > profile_tree_32k.log 2>&1
timeout 2400 python scripts/bench_serve.py --slots 4 --requests 12 \
  > bench_serve_r2.log 2>&1

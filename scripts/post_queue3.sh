#!/bin/bash
# Wait for post_queue2 (PID $1), then retry the 32k tree profile with
# restart-on-wedge (the tunnel can drop any long device call).
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
for i in 1 2 3; do
  timeout 2400 python scripts/profile_tree.py --row hard_32k --ctx 32768 \
    --attn pallas --tree-shape 4,16,16,16,16,16 --window 12288 \
    > profile_tree_32k.log 2>&1 && break
  echo "[retry $i] profile_tree failed $(date -u +%T)" >> profile_tree_32k.retries
  sleep 20
done

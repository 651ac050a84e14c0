#!/bin/bash
# Round-5d on-chip queue: batch-aware tree shapes for serving.
# At batch 4 the 85-node depth-6 verify is MXU-compute-bound (B x N token
# rows through the full model: 340 x ~5 GFLOP ~ 1.7 TFLOP per verify);
# the tree spends 85 rows of compute to accept ~6.5 tokens. Smaller trees
# trade accept for a ~N-proportional verify-FLOP cut — measure the
# throughput-optimal serving shape at b4, then serve with it.
set -x
cd /root/repo
python bench.py --rows hard_8k --batch 4 --tree-shape 4,8,8,8,8 --fresh-rows --gen 256 --headline none
python bench.py --rows hard_8k --batch 4 --tree-shape 4,8,8,8 --fresh-rows --gen 256 --headline none
python scripts/bench_serve.py --row hard_8k --slots 4 --requests 12 --attn pallas --tree-shape 4,8,8,8,8 > bench_serve_r5d.log 2>&1
tail -4 bench_serve_r5d.log
echo QUEUE_DONE

#!/bin/bash
# Round-4b on-chip queue: batch-4 decode at 8k, the hard_8k lossless
# bitdiff (flip at pos 128, margin 0.004), serving bench at head, and the
# long rows re-run without the extras sweep (magicdec@131k compile-crashes
# the helper; extras ran only because a single-row run makes that row the
# headline by fallback).
set -x
cd /root/repo
python scripts/bitdiff_arms.py --row hard_8k --attn pallas --gen 256 > bitdiff_hard8k_r4.log 2>&1
tail -5 bitdiff_hard8k_r4.log
python bench.py --rows hard_8k --batch 4 --fresh-rows --gen 256 --headline none
python scripts/bench_serve.py --row hard_8k --slots 4 --requests 12 > bench_serve_r4.log 2>&1
tail -3 bench_serve_r4.log
python bench.py --rows long_128k --fresh-rows --headline none
python bench.py --rows long_262k --fresh-rows --headline none
echo QUEUE_DONE

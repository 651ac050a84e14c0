#!/bin/bash
# Round-5e on-chip queue: the single-commit evidence chain (r4 verdict #2).
#
# Everything here is measured FRESH at one frozen source state (HEAD,
# longspec_tpu/ unchanged since 2c9d7ba) under the production law
# (pallas + bf16_pinned + uniform decode shape):
#   1. the full default row set -> BENCH_r05's rows all carry this commit
#   2. the two historically-red chunked rows (hard_8k chunked, hard_32k
#      chunked magicdec) -> prove the precision-law fix flipped them green
#      at head, or reopen the bug (r4 verdict #8)
#   3. the wint8-32k and batch-4 rows whose r5c measurements were lost to
#      an environment reset (numbers survive only in logs/commit messages)
#      -> re-land them as committed row JSONs at head
# Each bench.py invocation persists every finished row to .bench_cache/
# as it completes, so a mid-queue death loses only the row in flight.
set -x
cd /root/repo
python bench.py --fresh-rows
python bench.py --rows hard_8k --attn chunked --fresh-rows --headline none
python bench.py --rows hard_32k --attn chunked --fresh-rows --headline none
python bench.py --rows hard_32k --target-quant int8 --fresh-rows --headline none
python bench.py --rows hard_8k --batch 4 --tree-shape 4,8,8,8,8 --fresh-rows --headline none
echo QUEUE_DONE

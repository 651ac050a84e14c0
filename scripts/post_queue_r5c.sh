#!/bin/bash
# Round-5c on-chip queue: the pinned-law production measurements.
#   1. hard_8k batch-4 row at HEAD (pinned): the b1/b4 profile says tree
#      rounds scale 2.18x for 4x rows — the old +19% row predates the
#      deferred-commit/zero-copy/pinned works; re-measure.
#   2. Serve bench under the production kernel+law (pallas, depth-6,
#      pinned) with the phase breakdown, then a headline run without the
#      profiling sync.
#   3. hard_32k + int8 target weights under pinned (the highest-law try
#      died mid-run; pinned halves both the MXU passes and, with wint8,
#      the weight bytes).
#   4. Pinned-law bitdiff for the record (expect token-exact, ulp drift).
set -x
cd /root/repo
python bench.py --rows hard_8k --batch 4 --fresh-rows --gen 256 --headline none
python scripts/bench_serve.py --row hard_8k --slots 4 --requests 12 --attn pallas --tree-shape 4,16,16,16,16,16 --profile-phases > bench_serve_r5_profile.log 2>&1
tail -4 bench_serve_r5_profile.log
python scripts/bench_serve.py --row hard_8k --slots 4 --requests 12 --attn pallas --tree-shape 4,16,16,16,16,16 > bench_serve_r5.log 2>&1
tail -4 bench_serve_r5.log
python bench.py --rows hard_32k --target-quant int8 --fresh-rows --gen 256 --headline none
python scripts/bitdiff_arms.py --row hard_8k --attn pallas --gen 256 > bitdiff_hard8k_r5c_pinned.log 2>&1
tail -8 bitdiff_hard8k_r5c_pinned.log
echo QUEUE_DONE

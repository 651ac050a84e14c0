#!/bin/bash
# Round-5b on-chip queue: drift forensics + the precision-law speed sweep
# + the perf fronts.
#   1. Profiled bitdiff via the PRODUCTION path (generate return_state).
#   2. hard_8k depth-5 row at HEAD (green in r3; selectable-config
#      candidate if depth-6 keeps flipping ties).
#   3. Decode-precision sweep on the hard_8k pallas depth-6 row: high and
#      bf16_pinned vs the measured highest (229 tok/s) — pick the fastest
#      green law.
#   4. hard_32k with int8 target weights (decode roofline lever).
#   5. Tree-round component scaling b1 vs b4.
#   6. T=1 study (VERDICT r4 #6).
#   7. Prefill timing for the segmented kernel (VERDICT r4 #7).
set -x
cd /root/repo
python scripts/bitdiff_arms.py --row hard_8k --attn pallas --gen 256 > bitdiff_hard8k_r5b.log 2>&1
tail -12 bitdiff_hard8k_r5b.log
python bench.py --rows hard_8k --tree-shape 4,16,16,16,16 --fresh-rows --gen 256 --headline none
python bench.py --rows hard_8k --decode-precision high --fresh-rows --gen 256 --headline none
python bench.py --rows hard_8k --decode-precision bf16_pinned --fresh-rows --gen 256 --headline none
python bench.py --rows hard_32k --target-quant int8 --fresh-rows --gen 256 --headline none
python scripts/profile_tree.py --row hard_8k --attn pallas --window 12288 --tree-shape 4,16,16,16,16,16 --batch 1 > profile_tree_b1_r5.log 2>&1
tail -2 profile_tree_b1_r5.log
python scripts/profile_tree.py --row hard_8k --attn pallas --window 12288 --tree-shape 4,16,16,16,16,16 --batch 4 > profile_tree_b4_r5.log 2>&1
tail -2 profile_tree_b4_r5.log
python scripts/t1_study.py --row hard_32k --gen 256 > t1_study_r5.log 2>&1
tail -3 t1_study_r5.log
python scripts/prefill_timing.py > prefill_timing_r5.log 2>&1
tail -5 prefill_timing_r5.log
echo QUEUE_DONE

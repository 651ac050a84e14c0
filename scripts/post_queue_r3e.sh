#!/bin/bash
# Round-3e on-chip queue: exploit the pallas ring kernel + gather writes.
set -x
cd /root/repo

# 0. vanilla-step dissection at 32k: the O(s_max) decode-loop copy question
#    (ring vanilla at 262k = 14.8 ms/step vs dense-cache 32k = 24.7 ms/step)
timeout 5400 python scripts/profile_vanilla.py --ctx 32768 --gen 64 \
    > profile_vanilla_r3e.log 2>&1

# 1. prefill timing: chunked vs pallas ring at 131k (incl. compile; the
#    second number in each line is the steady per-segment cost)
timeout 3600 python scripts/prefill_timing.py --ctx 131072 \
    > prefill_timing_r3e.log 2>&1

# 2. long_262k under the pallas ring kernel (new row; expect faster decode)
timeout 5400 python bench.py --rows long_262k --attn pallas --fresh-rows \
    --headline none > post_r3e_rows.log 2>&1

# 3. batched decode at the headline context (reference never measures B>1)
timeout 3600 python bench.py --rows hard_32k --batch 4 --fresh-rows \
    --headline none >> post_r3e_rows.log 2>&1

python scripts/results_table.py --write
git add -f .bench_cache/row_*.json 2>/dev/null
git add README.md post_r3e_rows.log prefill_timing_r3e.log profile_vanilla_r3e.log 2>/dev/null
git commit -q -m "Round-3e rows: pallas ring 262k, batched decode, prefill timing

No-Verification-Needed: measurement artifacts only" || true
echo "[post_queue_r3e] done $(date -u +%F' '%T)" >> bench_run.log

# 4. hard_32k under the O(window) ring + pallas ring kernel: ring vanilla at
#    262k ran 67 tok/s vs the dense-cache 32k row's 40 — same law (window
#    12288 + 4 sinks) on both arms, so the comparison is apples-to-apples
timeout 3600 python bench.py --rows hard_32k --attn pallas --kv-ring 22528 \
    --prefill-seg 8192 --fresh-rows --headline none >> post_r3e_rows.log 2>&1
python scripts/results_table.py --write
git add -f .bench_cache/row_*.json README.md post_r3e_rows.log 2>/dev/null
git commit -q -m "r3e: hard_32k ring-cache row

No-Verification-Needed: measurement artifacts only" || true

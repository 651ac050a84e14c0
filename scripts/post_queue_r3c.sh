#!/bin/bash
# Round-3c on-chip queue: validate the pinned-cast decode law, then land
# the remaining rows under it.
set -x
cd /root/repo

# 1. bit-exact dual-arm forensics must now be clean (caches identical)
timeout 3600 python scripts/bitdiff_arms.py --row hard_8k --attn pallas \
    --gen 256 > bitdiff_hard8k_pallas_fixed.log 2>&1

# 2. re-measure the red hard_8k pallas row under the pinned law
timeout 2700 python bench.py --rows hard_8k --attn pallas --fresh-rows \
    --headline none >> post_r3c_rows.log 2>&1

# 3. refresh the headline row under the same law (also perf sanity)
timeout 3600 python bench.py --rows hard_32k --fresh-rows \
    >> post_r3c_rows.log 2>&1

# 4. the 262k ring row (first measurement)
timeout 5400 python bench.py --rows long_262k --headline none \
    >> post_r3c_rows.log 2>&1

# 5. refresh long_128k + easy_8k under the pinned law
timeout 3600 python bench.py --rows long_128k --fresh-rows --headline none \
    >> post_r3c_rows.log 2>&1
timeout 2700 python bench.py --rows easy_8k --fresh-rows --headline none \
    >> post_r3c_rows.log 2>&1

python scripts/results_table.py --write
git add -f .bench_cache/row_*.json 2>/dev/null
git add README.md bitdiff_hard8k_pallas_fixed.log profile_tree_32k_r3.log \
    post_r3c_rows.log 2>/dev/null
git commit -q -m "Round-3c rows under the pinned-cast law: hard_8k pallas green, 262k ring row

No-Verification-Needed: measurement artifacts only" || true
echo "[post_queue_r3c] done $(date -u +%F' '%T)" >> bench_run.log

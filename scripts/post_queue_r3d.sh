#!/bin/bash
# Round-3d on-chip queue: 262k row (grouped-dispatch fix), chunked-row
# refreshes under the current law, tree-depth sweeps, native-law experiment,
# bitdiff revalidation.
set -x
cd /root/repo

# 1. long_262k — first successful measurement (prefill dispatch fix 133b12e)
timeout 5400 python bench.py --rows long_262k --fresh-rows --headline none \
    > post_r3d_rows.log 2>&1

# 2. chunked hard rows re-measured under the current law (the committed
#    chunked rows predate the KV-carry + pinned-cast commits: provenance mix)
timeout 4500 python bench.py --rows hard_8k,hard_32k --attn chunked \
    --fresh-rows --headline hard_32k >> post_r3d_rows.log 2>&1

# 3. tree-depth sweep at 32k pallas: depth 7 (current best depth 6 = 4.19x)
timeout 2700 python bench.py --rows hard_32k --tree-shape 4,16,16,16,16,16,16 \
    --fresh-rows --headline none >> post_r3d_rows.log 2>&1

# 4. depth sweep hard_8k pallas depth 6
timeout 2700 python bench.py --rows hard_8k --attn pallas \
    --tree-shape 4,16,16,16,16,16 --fresh-rows --headline none \
    >> post_r3d_rows.log 2>&1

# 5. easy_8k depth 6 + 7 (accept saturated at 6.0 of max 6 at depth 5)
timeout 2700 python bench.py --rows easy_8k --tree-shape 4,16,16,16,16,16 \
    --fresh-rows --headline none >> post_r3d_rows.log 2>&1
timeout 2700 python bench.py --rows easy_8k \
    --tree-shape 4,16,16,16,16,16,16 --fresh-rows --headline none \
    >> post_r3d_rows.log 2>&1

# 6. native-law experiment at 32k: faster on BOTH arms iff pinned casts hold
timeout 2700 python bench.py --rows hard_32k --decode-dtype native \
    --fresh-rows --headline none >> post_r3d_rows.log 2>&1

# 7. bitdiff dual-arm revalidation (host-side cache pulls fix the r3c OOM)
timeout 3600 python scripts/bitdiff_arms.py --row hard_8k --attn pallas \
    --gen 256 > bitdiff_hard8k_r3d.log 2>&1

python scripts/results_table.py --write
git add -f .bench_cache/row_*.json 2>/dev/null
git add README.md post_r3d_rows.log bitdiff_hard8k_r3d.log 2>/dev/null
git commit -q -m "Round-3d rows: 262k measured, chunked rows refreshed, depth sweeps

No-Verification-Needed: measurement artifacts only" || true
echo "[post_queue_r3d] done $(date -u +%F' '%T)" >> bench_run.log

#!/bin/bash
# Round-3 post-training measurement queue. Wait for the cache-building
# supervisor (PID $1) to finish, then produce every committed artifact the
# round needs: alternate-impl bench rows, the serving bench, the 32k tree
# profile, and the regenerated README table. Each step is independently
# resumable — finished rows are cached and reused.
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done

# fp32-decode re-measure of the easy row (its cached row predates the law)
timeout 2400 python bench.py --rows easy_8k --fresh-rows --headline none \
    >> post_r3_rows.log 2>&1
# lossless under BOTH impls on the hard rows (VERDICT item 2)
timeout 2400 python bench.py --rows hard_8k --attn pallas --headline none \
    >> post_r3_rows.log 2>&1
timeout 3600 python bench.py --rows hard_32k --attn chunked --headline none \
    >> post_r3_rows.log 2>&1

# serving beats sequential (VERDICT item 3)
timeout 3000 python scripts/bench_serve.py --slots 4 --requests 12 \
    > bench_serve_r3.log 2>&1

# 32k tree-round profile incl. int8 head (VERDICT item 4)
timeout 2400 python scripts/profile_tree.py --row hard_32k --ctx 32768 \
    --attn pallas --tree-shape 4,16,16,16,16,16 --window 12288 \
    > profile_tree_32k_r3.log 2>&1 || true

python scripts/results_table.py --write

git add -f .bench_cache/target_hard256_s16384_cap48k.npz \
    .bench_cache/draft_hard256_s16384_cap48k_a4.npz \
    .bench_cache/row_*.json 2>/dev/null
git add README.md bench_serve_*.json bench_serve_r3.log \
    profile_tree_32k_r3.log post_r3_rows.log bench_sup_out.json 2>/dev/null
git commit -q -m "Round-3 bench artifacts: hard-row model caches, fp32-law rows, serving + profile logs

Committed so the driver bench path never trains: every row measures from
these caches in minutes.
No-Verification-Needed: measurement artifacts and binary model caches only" || true

#!/bin/bash
# Round-5a on-chip queue: PROVE losslessness at HEAD (VERDICT r4 #1/#8).
#   1. bitdiff of the vanilla/tree arms on the hard_8k pallas row — the
#      row that was red at a57f4eb; the 0610118 precision fix must show
#      the committed K/V rows bit-identical.
#   2. Fresh hard_8k + hard_32k pallas rows at HEAD.
#   3. The two red chunked rows re-measured (7103707 predicts green).
set -x
cd /root/repo
python scripts/bitdiff_arms.py --row hard_8k --attn pallas --gen 256 > bitdiff_hard8k_r5.log 2>&1
tail -6 bitdiff_hard8k_r5.log
python bench.py --rows hard_8k,hard_32k --fresh-rows --gen 256 --headline hard_32k
python bench.py --rows hard_8k,hard_32k --attn chunked --fresh-rows --gen 256 --headline none
echo QUEUE_DONE

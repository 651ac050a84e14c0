#!/bin/bash
# Round-4a on-chip queue: re-measure every row at head (deferred-commit
# engine), plus the batch-4 row and the T=1 acceptance study.
set -x
cd /root/repo
python bench.py --rows easy_8k,hard_8k --fresh-rows
python bench.py --rows hard_32k --batch 4 --fresh-rows --gen 256
python scripts/t1_study.py --row hard_32k --gen 256
python bench.py --rows long_128k --fresh-rows
python bench.py --rows long_262k --fresh-rows
echo QUEUE_DONE

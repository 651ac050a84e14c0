#!/bin/bash
# Wait for post_queue4 (PID $1), then:
# 1. re-measure the int8-KV 32k row fresh (forensics now replay under the
#    int8 decode law; the cached row's margin used the wrong bf16 law);
# 2. re-measure the bf16 headline row fresh so its chain/magicdec forensics
#    replay under the engine's pallas law too, leaving bench_sup_out.json
#    holding the headline row.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
bash scripts/bench_supervisor.sh hard_32k --fresh-rows --kv-quant int8
cp bench_sup_out.json bench_int8_32k.json
bash scripts/bench_supervisor.sh hard_32k --fresh-rows

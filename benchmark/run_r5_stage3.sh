#!/bin/bash
# Round-5 stage 3 (after stage 2 releases the TPU): final measured bench
# with the round's kernel work (gm prologue, pm groups, probe fixes) under
# autotune, logged for PERFORMANCE.md.
set -x
cd /root/repo
PY=/opt/venv/bin/python

timeout 3000 $PY bench.py > /tmp/bench_r5_final.json 2> /tmp/bench_r5_final.log
echo "--- bench output ---"
cat /tmp/bench_r5_final.json
echo STAGE3_DONE

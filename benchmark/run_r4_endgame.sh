#!/bin/bash
# Round-4 endgame (run after E8 releases the TPU):
#   1. MCMC 7k protocol row on the 640x416 atrium scene — the hd-scene
#      MCMC run is blocked on tunnel wedges during >=3M-budget compiles
#      (see RESULTS.md); the small scene keeps every program in the
#      proven-survivable compile class while still exercising the full
#      protocol semantics (seed, holdout, quantized metrics, real TPU).
#   2. Final bench.py (validates the pm render path on hardware).
set -x
cd /root/repo
PY=/opt/venv/bin/python

for try in 1 2; do
  timeout 4500 $PY benchmark/run_quality.py 7000 mcmc \
    --scene benchmark/scenes/atrium --max-instances 2097152 \
    >> /tmp/q_mcmc640.log 2>&1 && break
  echo "mcmc640 attempt $try failed; resuming" >> /tmp/q_mcmc640.log
  sleep 30
done

timeout 2400 $PY bench.py > /tmp/bench_r4_final.log 2>&1
echo ENDGAME_DONE

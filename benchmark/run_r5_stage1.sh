#!/bin/bash
# Round-5 stage 1: MCMC protocol run to 30k steps on the 640x416 atrium
# scene — the "second strategy at protocol length" row VERDICT r4 ranks
# first. Resumes from the r4 endgame's step-6000 autosave.
#
# Config notes (RESULTS.md r5 section documents this):
# - --mcmc-cap 750000: reference max_cap default is 2M (mcmc.jl:63), a
#   ceiling not a target; the 2M tail alone costs ~10 h on this tunneled
#   v5e. 750k ~= the scene's ADC-converged population (777k on atrium_hd)
#   and stays above the published 7k row's 715k, so the 0..7000 trajectory
#   is bit-identical to the r4 row (cap first binds at ~step 7100).
# - --max-instances 3145728: pin the budget at the 3M class (proven
#   compilable through the tunnel in r4) instead of ladder-climbing.
set -x
cd /root/repo
PY=/opt/venv/bin/python
LOG=/tmp/q_mcmc640_30k.log
START=$(date +%s)
for try in 1 2 3 4; do
  [ $(( $(date +%s) - START )) -gt 18000 ] && break
  bash benchmark/watchdog_run.sh "$LOG" 25 15000 \
    "$PY" benchmark/run_quality.py 30000 mcmc \
    --scene benchmark/scenes/atrium --max-instances 3145728 --mcmc-cap 750000 \
    && break
  echo "stage1 attempt $try failed; resuming from latest autosave" >> "$LOG"
  sleep 45
done
cp -f benchmark/scenes/atrium/quality_rows.json \
      benchmark/results/quality_rows_mcmc30k_atrium_r5.json 2>/dev/null
echo STAGE1_DONE >> "$LOG"
echo STAGE1_DONE

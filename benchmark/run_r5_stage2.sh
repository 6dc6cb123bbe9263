#!/bin/bash
# Round-5 stage 2 (run after stage 1 releases the TPU):
#   1. E6 — the decisive ADC-7k churn experiment (VERDICT r4 "do this" #4):
#      faithful protocol EXCEPT --max-screen-size 0 on atrium_hd. If the 7k
#      row heals, the post-reset size-prune churn mechanism E8 isolated is
#      confirmed end-to-end.
#   2. MCMC 7k protocol row on atrium_hd — resumes the step-4000 autosave.
#      --mcmc-cap 280000 keeps instance demand inside the pinned 1<<22
#      budget class (the >=3M compiles through the tunnel wedged 3x in r4;
#      the cap is the documented scene-sizing knob, see api.benchmark).
set -x
cd /root/repo
PY=/opt/venv/bin/python

LOG=/tmp/q_e6.log
for try in 1 2; do
  bash benchmark/watchdog_run.sh "$LOG" 25 9000 \
    "$PY" benchmark/quality_experiments.py e6 && break
  echo "e6 attempt $try failed; retrying (no autosave: fresh run)" >> "$LOG"
  sleep 45
done

LOG=/tmp/q_mcmc_hd7k.log
for try in 1 2 3; do
  bash benchmark/watchdog_run.sh "$LOG" 30 10000 \
    "$PY" benchmark/run_quality.py 7000 mcmc \
    --scene benchmark/scenes/atrium_hd --max-instances 4194304 --mcmc-cap 280000 \
    && break
  echo "mcmc-hd attempt $try failed; resuming" >> "$LOG"
  sleep 45
done
cp -f benchmark/scenes/atrium_hd/quality_rows.json \
      benchmark/results/quality_rows_mcmc7k_hd_r5.json 2>/dev/null
echo STAGE2_DONE

#!/bin/bash
# Round-5 stage 2b: extend the capped MCMC-hd run to protocol length
# (30k). Resumes the stage-2 7k run's autosaves; same pinned budget class
# and cap (see run_r5_stage2.sh).
set -x
cd /root/repo
PY=/opt/venv/bin/python
LOG=/tmp/q_mcmc_hd30k.log
START=$(date +%s)
for try in 1 2 3 4; do
  [ $(( $(date +%s) - START )) -gt 14400 ] && break
  bash benchmark/watchdog_run.sh "$LOG" 30 12000 \
    "$PY" benchmark/run_quality.py 30000 mcmc \
    --scene benchmark/scenes/atrium_hd --max-instances 4194304 --mcmc-cap 280000 \
    && break
  echo "mcmc-hd-30k attempt $try failed; resuming" >> "$LOG"
  sleep 45
done
cp -f benchmark/scenes/atrium_hd/quality_rows.json \
      benchmark/results/quality_rows_mcmc30k_hd_r5.json 2>/dev/null
echo STAGE2B_DONE >> "$LOG"
echo STAGE2B_DONE

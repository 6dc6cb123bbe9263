#!/bin/bash
# Round-4 TPU quality chain (serial: ONE JAX process against the TPU).
#   1. MCMC protocol rows (7k/30k on atrium_hd) — BASELINE config 3,
#      deferred since round 2 (VERDICT r3 "do this" #4). Autosave-resumes.
#   2. E8: hd160 dense-capture recovery trace + 7k row (VERDICT #5).
#   3. ADC 30k protocol re-run on the device-refine + compile-cache step
#      (wall-clock evidence for VERDICT #2; target < 90 min).
# Kernel-variant env deliberately UNSET: the r3 30k run proved the
# defaults at protocol scale; a first GSPLAT_BLEND_TB=4 attempt died in a
# TPU worker crash right after the 2.36M-budget regrowth (/tmp/q_mcmc.log).
# Each stage retries once (worker crashes are resumable via autosaves).
set -x
cd /root/repo
PY=/opt/venv/bin/python

for try in 1 2 3; do
  timeout 16000 $PY benchmark/run_quality.py 30000 mcmc >> /tmp/q_mcmc.log 2>&1 && break
  echo "mcmc attempt $try failed; resuming" >> /tmp/q_mcmc.log
  sleep 60
done
cp -f benchmark/scenes/atrium_hd/quality_rows.json /tmp/quality_rows_mcmc.json 2>/dev/null

for try in 1 2; do
  timeout 9000 $PY benchmark/quality_experiments.py e8 >> /tmp/q_e8.log 2>&1 && break
  echo "e8 attempt $try failed; retrying" >> /tmp/q_e8.log
  sleep 60
done

for try in 1 2; do
  timeout 12000 $PY benchmark/run_quality.py 30000 default >> /tmp/q_adc.log 2>&1 && break
  echo "adc attempt $try failed; resuming" >> /tmp/q_adc.log
  sleep 60
done
cp -f benchmark/scenes/atrium_hd/quality_rows.json /tmp/quality_rows_adc.json 2>/dev/null
echo CHAIN_DONE

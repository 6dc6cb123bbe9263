#!/bin/bash
# Round-4 TPU quality chain (serial: ONE JAX process against the TPU).
#   1. MCMC protocol rows (7k/30k on atrium_hd)  — BASELINE config 3,
#      deferred since round 2 (VERDICT r3 "do this" #4).
#   2. E8: hd160 dense-capture recovery trace + 7k row (VERDICT #5).
#   3. ADC 30k protocol re-run on the device-refine + compile-cache step
#      (wall-clock evidence for VERDICT #2; target < 90 min).
# Each stage is autosave-resumable; logs in /tmp/q_*.log.
set -x
cd /root/repo
PY=/opt/venv/bin/python

timeout 18000 $PY benchmark/run_quality.py 30000 mcmc > /tmp/q_mcmc.log 2>&1
cp -f benchmark/scenes/atrium_hd/quality_rows.json /tmp/quality_rows_mcmc.json 2>/dev/null

timeout 10800 $PY benchmark/quality_experiments.py e8 > /tmp/q_e8.log 2>&1

timeout 14400 $PY benchmark/run_quality.py 30000 default > /tmp/q_adc.log 2>&1
cp -f benchmark/scenes/atrium_hd/quality_rows.json /tmp/quality_rows_adc.json 2>/dev/null
echo CHAIN_DONE

#!/bin/bash
# Round-4 continuation once the MCMC 7k row has printed: E8 (hd160
# recovery trace + 7k row), then resume MCMC toward 30k with whatever
# wall-clock remains (autosaves make the tail resumable next round).
set -x
cd /root/repo
PY=/opt/venv/bin/python

for try in 1 2; do
  timeout 7200 $PY benchmark/quality_experiments.py e8 >> /tmp/q_e8.log 2>&1 && break
  echo "e8 attempt $try failed; retrying" >> /tmp/q_e8.log
  sleep 60
done

for try in 1 2 3; do
  timeout 14000 $PY benchmark/run_quality.py 30000 mcmc >> /tmp/q_mcmc.log 2>&1 && break
  echo "mcmc resume attempt $try failed; resuming" >> /tmp/q_mcmc.log
  sleep 60
done
cp -f benchmark/scenes/atrium_hd/quality_rows.json /tmp/quality_rows_mcmc.json 2>/dev/null
echo AFTER7K_DONE

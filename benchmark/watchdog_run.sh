#!/bin/bash
# watchdog_run.sh <log> <stall_min> <timeout_s> <cmd...>
#
# Runs <cmd> (stdout+stderr appended to <log>) and kills its whole process
# group if the log goes quiet for <stall_min> minutes or the overall
# <timeout_s> budget expires. This is the round-4 lesson operationalized:
# the TPU tunnel sometimes wedges mid-compile with the client frozen and no
# RPC progress — a plain `timeout` burns hours on a dead attempt, while log
# mtime is a faithful progress signal now that benchmark() heartbeats a
# loss line every 200 steps (api.py train(log_every=200)).
#
# Exit status: the command's own status, or 124 on stall/timeout kill.
set -u
LOG=$1; STALL_MIN=$2; TIMEOUT_S=$3; shift 3

touch "$LOG"
setsid "$@" >> "$LOG" 2>&1 &
PID=$!
START=$(date +%s)
while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    NOW=$(date +%s)
    AGE=$(( NOW - $(stat -c %Y "$LOG") ))
    ELAPSED=$(( NOW - START ))
    if [ "$AGE" -gt $(( STALL_MIN * 60 )) ] || [ "$ELAPSED" -gt "$TIMEOUT_S" ]; then
        echo "[watchdog] killing pid $PID (log quiet ${AGE}s, elapsed ${ELAPSED}s)" >> "$LOG"
        kill -TERM -- -"$PID" 2>/dev/null
        sleep 20
        kill -KILL -- -"$PID" 2>/dev/null
        wait "$PID" 2>/dev/null
        exit 124
    fi
done
wait "$PID"
exit $?

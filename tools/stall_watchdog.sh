#!/bin/bash
# Watches the bench stderr log; when no new "key: Xs" line appears for
# STALL_SEC seconds, captures JVM thread dump + per-thread CPU deltas +
# /proc schedstat of the hottest task threads. Round-14 diagnosis tool.
LOG=${1:?bench log}
OUT=${2:-/tmp/r14_stall_dumps}
STALL_SEC=${3:-20}
mkdir -p "$OUT"
last_size=0
last_change=$(date +%s)
n=0
while true; do
  sz=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  now=$(date +%s)
  if [ "$sz" != "$last_size" ]; then last_size=$sz; last_change=$now; sleep 2; continue; fi
  if [ $((now - last_change)) -ge "$STALL_SEC" ]; then
    PID=$(pgrep -f "spark.app.name=enn-bench" | head -1)
    [ -z "$PID" ] && { sleep 5; continue; }
    n=$((n+1))
    TS=$(date +%H%M%S)
    D="$OUT/stall_${TS}_$n"
    jcmd "$PID" Thread.print > "${D}_threads.txt" 2>&1
    # per-thread utime snapshot (jiffies), twice 3s apart
    for t in /proc/$PID/task/*/stat; do awk '{print $1, $14+$15}' "$t"; done > "${D}_cpu1.txt" 2>/dev/null
    sleep 3
    for t in /proc/$PID/task/*/stat; do awk '{print $1, $14+$15}' "$t"; done > "${D}_cpu2.txt" 2>/dev/null
    jcmd "$PID" Thread.print > "${D}_threads2.txt" 2>&1
    echo "captured $D at $(date +%T)"
    last_change=$now  # rearm (captures every STALL_SEC while stalled)
    sleep 10
  fi
  sleep 2
done

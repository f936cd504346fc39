#!/bin/bash
# Samples the enn-bench JVM every INTERVAL seconds: GC util, code cache,
# metaspace, thread count, and (when sick) a thread dump. Round-14 pathology
# instrumentation — correlates per-key bench stalls with JVM state.
OUT=${1:-/tmp/r14_jvm_monitor.log}
INTERVAL=${2:-45}
echo "monitor start $(date +%T)" > "$OUT"
while true; do
  PID=$(pgrep -f "spark.app.name=enn-bench" | head -1)
  if [ -z "$PID" ]; then sleep 5; continue; fi
  TS=$(date +%T)
  {
    echo "=== $TS pid=$PID"
    jstat -gcutil "$PID" 2>/dev/null | tail -1
    jcmd "$PID" Compiler.codecache 2>/dev/null | grep -E "size|full_count" | head -8
    jcmd "$PID" VM.metaspace 2>/dev/null | grep -E "Usage|Virtual space" | head -4
    echo "threads: $(ls /proc/$PID/task 2>/dev/null | wc -l)"
    # top 3 CPU-burning threads in last sample window via /proc tick delta is
    # overkill; instead dump any task thread in janino right now
    jcmd "$PID" Thread.print 2>/dev/null | grep -B2 "janino" | grep '^"' | head -3
  } >> "$OUT" 2>&1
  sleep "$INTERVAL"
done

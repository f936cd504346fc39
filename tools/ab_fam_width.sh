#!/bin/bash
# r14: isolated-cold A/B of ENN_FAMILY_RECALL_THREADS on an IDLE host —
# fresh bench subprocess per run (ann_recall_families only), strictly
# alternating widths, per-pair floors. Usage: ab_fam_width.sh W_A W_B PAIRS
set -u
WA=${1:-2}; WB=${2:-12}; PAIRS=${3:-3}
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_BENCH_KEYS=ann_recall_families
export SPARK_GRAFT_BENCH_REPEATS=1
for i in $(seq 1 "$PAIRS"); do
  for W in "$WA" "$WB"; do
    echo "== pair $i width $W  loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
    ENN_FAMILY_RECALL_THREADS=$W python3 bench.py 2>/dev/null \
      | python3 -c "import json,sys; d=json.loads(sys.stdin.read().strip().splitlines()[-1]); print('  arf:', d['queries'].get('arf') or d['queries'].get('ann_recall_families'))"
  done
done

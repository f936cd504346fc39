#!/bin/bash
# Interleaved A/B for Change 16 (CC lazy-checkpoint fold).
# A = working tree (lazy localCheckpoint folded into the round count)
# B = HEAD dedup.py (eager checkpoint + separate count per round)
# Fresh bench subprocess per run, strictly alternating; per-key minima.
set -e
cd /root/repo
KEYS="dup_clusters,embedding_clusters"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_KEYS="$KEYS"
cp elastik_nearest_neighbors_spark/operators/dedup.py /tmp/dedup_A.py
git show HEAD:elastik_nearest_neighbors_spark/operators/dedup.py > /tmp/dedup_B.py
# ADVICE r13: an interruption between the variant-B copy and the final
# restore must not leave B live in the working tree
trap 'cp /tmp/dedup_A.py elastik_nearest_neighbors_spark/operators/dedup.py' EXIT
for i in 1 2 3; do
  for v in A B; do
    cp /tmp/dedup_${v}.py elastik_nearest_neighbors_spark/operators/dedup.py
    echo "=== run ${v}_${i} $(date -u +%H:%M:%S) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
    python bench.py > plans/r13/ab/c16_${v}_${i}.json 2>/dev/null || echo "RUN ${v}_${i} FAILED"
    tail -c 400 plans/r13/ab/c16_${v}_${i}.json
    echo
  done
done
cp /tmp/dedup_A.py elastik_nearest_neighbors_spark/operators/dedup.py

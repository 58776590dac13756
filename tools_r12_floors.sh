#!/bin/bash
# Round-12 floors hunter: repeated GATED, targeted bench runs of the
# queries this round changed (plus t1 as an untouched window canary),
# one reps-file per attempt.  The per-query MIN across attempts is the
# floor evidence; each attempt self-gates on a quiet host and records
# its own io_bulk reading, so degraded windows are visible, not hidden.
set -u
cd /root/repo
N=${1:-6}
QUERIES=${2:-t1_token_counts,c1_clean_corpus,c10_lsh_decontamination,d7_edit_distance_verify,c14_span_redaction,d6_dup_groups,d2_minhash_lsh_pairs,c7_training_mix}
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_REPS=4 \
  SPARK_GRAFT_BENCH_GATE_SEC=900 \
  SPARK_GRAFT_BENCH_REPS_FILE="/root/repo/bench_reps_r12_floors_h${i}.json" \
  python bench.py >"/tmp/floors_h${i}.log" 2>&1
  sleep 60
done

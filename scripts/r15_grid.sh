#!/bin/bash
# Round-15 grid campaign, part 1: validate the new lifecycle ops at 500k/5M
# (sig-index read-amp curve, struct-payload predicate search, tombstone-heavy
# compact), then the 50M tail (tombstone compact + maintained ingest+mine).
# One op family per JVM; full logs teed per run (grid hygiene).
cd /root/repo
mkdir -p docs/logs
run() { # run <tag> <docs> <ops>
  local tag="$1" docs="$2" ops="$3"
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS="$docs" BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS="$ops" \
    GRAFT_GC_GRACE_MS=60000 \
    sbt -batch "runMain graft.bench.CorpusBench" \
    > "docs/logs/r15_${tag}.log" 2>&1
  grep -E '"op"' "docs/logs/r15_${tag}.log" | tail -16
  df -h / | tail -1
}

# Phase 1 — new ops at 500k (validation scale).
run sigra_500k   500000 sig_index_read_amp,sig_index_read_amp_compact
run paywhere_500k 500000 knn_index_payload_where
run tomb_500k    500000 knn_index_tombstone,knn_index_tombstone_compact

# Phase 2 — 5M.
run sigra_5m   5000000 sig_index_read_amp,sig_index_read_amp_compact
run paywhere_5m 5000000 knn_index_payload_where
run tomb_5m    5000000 knn_index_tombstone,knn_index_tombstone_compact

echo DONE_R15_GRID_P1

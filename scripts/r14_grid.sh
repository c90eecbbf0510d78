#!/bin/bash
# Round-14 grid campaign. One op (or op family needing shared JVM state)
# per JVM — straggler isolation; full logs teed per run (grid hygiene:
# never pipe the live run through head).
cd /root/repo
mkdir -p docs/logs
run() { # run <tag> <docs> <ops>
  local tag="$1" docs="$2" ops="$3"
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS="$docs" BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS="$ops" \
    sbt -batch "runMain graft.bench.CorpusBench" \
    > "docs/logs/r14_${tag}.log" 2>&1
  grep -E '"op"' "docs/logs/r14_${tag}.log" | tail -12
  df -h / | tail -1
}

# Phase 1 — knnJoinAuto boundary bracketing: LSH (via the dispatcher's
# current 1 GB default) vs IVF at 1M / 2M, plus the missing 3M IVF point.
run auto_1m   1000000 knn_join_auto_recall
run ivf_1m    1000000 knn_join_ivf_recall
run auto_2m   2000000 knn_join_auto_recall
run ivf_2m    2000000 knn_join_ivf_recall
run ivf_3m    3000000 knn_join_ivf_recall

# Phase 2 — new lifecycle ops at 500k.
run readamp_500k 500000 knn_index_read_amp,knn_index_read_amp_compact
run payfilt_500k 500000 knn_index_payload_filter
run ingest_500k  500000 knn_index_ingest_mine
run sigdelta_500k 500000 hash_near_dups_delta

# Phase 3 — new lifecycle ops at 5M.
run readamp_5m 5000000 knn_index_read_amp,knn_index_read_amp_compact
run payfilt_5m 5000000 knn_index_payload_filter
run ingest_5m  5000000 knn_index_ingest_mine
run sigdelta_5m 5000000 hash_near_dups_delta
echo DONE_R14_GRID

#!/bin/bash
# Round-14 50M lifecycle refresh after the bucket-aligned members write.
# One op family per JVM; full logs teed; protocol heap; recall convention
# where the count form would hit the disk wall.
cd /root/repo
mkdir -p docs/logs
run() {
  local tag="$1" ops="$2"
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS=50000000 BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS="$ops" \
    sbt -batch "runMain graft.bench.CorpusBench" \
    > "docs/logs/r14_${tag}.log" 2>&1
  grep -E '"op"' "docs/logs/r14_${tag}.log" | tail -8
  df -h / | tail -1
}
run idx_50m knn_index_build,knn_index_delta,knn_index_trickle,semantic_dedup_delta
run idxneg_50m knn_index_negatives
run payfilt_50m knn_index_payload_filter
run sigdelta_50m hash_near_dups_delta
echo DONE_R14_50M

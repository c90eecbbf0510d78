#!/bin/bash
# Round-14 campaign part 2: re-bracket knnJoinAuto under the new 384 MB
# default (1M → lsh, 2M → ivf), and the maintained ingest+mine campaign.
cd /root/repo
mkdir -p docs/logs
run() {
  local tag="$1" docs="$2" ops="$3"
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS="$docs" BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS="$ops" \
    sbt -batch "runMain graft.bench.CorpusBench" \
    > "docs/logs/r14_${tag}.log" 2>&1
  grep -E '"op"' "docs/logs/r14_${tag}.log" | tail -25
  df -h / | tail -1
}
run auto2_1m 1000000 knn_join_auto_recall
run auto2_2m 2000000 knn_join_auto_recall
run ingest_maint_5m 5000000 knn_index_ingest_maint
echo DONE_R14_GRID2

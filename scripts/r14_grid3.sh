#!/bin/bash
# Round-14 campaign part 3: re-measure the stored-index lifecycle after the
# bucket-aligned members write (file count per generation dropped ~200x).
cd /root/repo
mkdir -p docs/logs
rm -rf /tmp/graft_corpus/knnidx*
run() {
  local tag="$1" docs="$2" ops="$3"
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS="$docs" BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS="$ops" \
    sbt -batch "runMain graft.bench.CorpusBench" \
    > "docs/logs/r14_${tag}.log" 2>&1
  grep -E '"op"' "docs/logs/r14_${tag}.log" | tail -25
  df -h / | tail -1
}
run idx_500k 500000 knn_index_build,knn_index_delta,knn_index_trickle,semantic_dedup_delta
run idxneg_500k 500000 knn_index_negatives
run readamp2_500k 500000 knn_index_read_amp,knn_index_read_amp_compact
run payfilt2_500k 500000 knn_index_payload_filter
run ingest2_500k 500000 knn_index_ingest_mine
run maint2_500k 500000 knn_index_ingest_maint
run compact2_500k 500000 knn_index_compact
run idx_5m 5000000 knn_index_build,knn_index_delta,knn_index_trickle,semantic_dedup_delta
run idxneg_5m 5000000 knn_index_negatives
run readamp2_5m 5000000 knn_index_read_amp,knn_index_read_amp_compact
run payfilt2_5m 5000000 knn_index_payload_filter
run ingest2_5m 5000000 knn_index_ingest_mine
run maint2_5m 5000000 knn_index_ingest_maint
run compact2_5m 5000000 knn_index_compact
echo DONE_R14_GRID3

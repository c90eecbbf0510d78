#!/bin/bash
# Round-13 50M campaign for the hard-negatives family: canary first
# (cosine_topk, untouched scan code — the host-speed reference), then the
# in-cell label-gate row that replaces the ~141 GB oversample arithmetic
# row, then stored-index mining (payload index staged untimed). One op per
# JVM (straggler-isolation convention), protocol heap, warmup=0/iters=1.
cd /root/repo
for op in cosine_topk hard_negatives_cell knn_index_negatives; do
  echo "=== $op $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS=50000000 BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS=$op \
    sbt -batch "runMain graft.bench.CorpusBench" 2>&1 \
    | grep -E '"op"|Exception in thread|failed|Error' | head -4
  df -h / | tail -1
done
echo DONE_R13_50M

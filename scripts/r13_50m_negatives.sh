#!/bin/bash
# Round-13 50M campaign for the hard-negatives family: canary first
# (cosine_topk, untouched scan code — the host-speed reference), then the
# in-cell label-gate row that replaces the ~141 GB oversample arithmetic
# row, then stored-index mining (payload index staged untimed). One op per
# JVM (straggler-isolation convention), protocol heap, warmup=0/iters=1.
#
# Log discipline: tee the FULL sbt output to a per-op log and grep the FILE
# afterwards — piping the live run through `grep | head` lets head exit
# after its matches, grep dies on SIGPIPE, and sbt's next stdout write can
# SIGPIPE-kill the benchmark JVM mid-run (and discards the evidence of a
# failed run entirely).
cd /root/repo
mkdir -p docs/logs
for op in cosine_topk hard_negatives_cell knn_index_negatives; do
  echo "=== $op $(date -u +%H:%M:%S) ==="
  log="docs/logs/r13_50m_${op}.log"
  CORPUS_DOCS=50000000 BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS=$op \
    sbt -batch "runMain graft.bench.CorpusBench" >"$log" 2>&1
  grep -E '"op"|Exception in thread|failed|Error' "$log" | head -4
  df -h / | tail -1
done
echo DONE_R13_50M

#!/bin/bash
# Round-15 grid campaign, part 2 — the 50M tail:
#  - tombstone-heavy compact against a fresh 45M stored index (verdict #7)
#  - sig-index read-amp curve vs 45M stored signatures
#  - the maintained 20-batch ingest+mine campaign (verdict #2)
# Disk discipline: knnidxts_50M is deleted after its run (the op rebuilds
# fresh each time anyway); GC grace 60 s keeps at most two 50M generations
# on disk at once.
cd /root/repo
mkdir -p docs/logs
run() { # run <tag> <docs> <ops>
  local tag="$1" docs="$2" ops="$3"
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS="$docs" BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS="$ops" \
    GRAFT_GC_GRACE_MS=60000 \
    sbt -batch "runMain graft.bench.CorpusBench" \
    > "docs/logs/r15_${tag}.log" 2>&1
  grep -E '"op"' "docs/logs/r15_${tag}.log" | tail -30
  df -h / | tail -1
}

run tomb_50m 50000000 knn_index_tombstone,knn_index_tombstone_compact
rm -rf /tmp/graft_corpus/knnidxts_50000000
df -h / | tail -1

run sigra_50m 50000000 sig_index_read_amp,sig_index_read_amp_compact
rm -rf /tmp/graft_corpus/sigidxra_50000000
df -h / | tail -1

run maint_50m 50000000 knn_index_ingest_maint
df -h / | tail -1

echo DONE_R15_GRID_P2

#!/bin/bash
# Round-10 5M-doc grid campaign: one op per JVM (a failed op's straggler
# tasks contaminate the next row's tally window — measured in round 9),
# protocol heap (8 g default fork), warmup=0/iters=1 at 5M by convention.
cd /root/repo
for op in \
    semantic_dedup \
    knn_join_ivf \
    knn_join_ivf_recall \
    knn_join_ivf_recall_p4c2 \
    knn_join_ivf_recall_p4c3 \
    knn_join_ivf_recall_p4c4 \
    hard_negatives_ann \
    cosine_topk \
    dedup_clusters \
    dedup_clusters_only \
    editdist_title_q6_rarest_pairs \
    editdist_title_q6_recall; do
  echo "=== $op $(date -u +%H:%M:%S) ==="
  CORPUS_DOCS=5000000 BENCH_WARMUP=0 BENCH_ITERS=1 CORPUS_OPS=$op \
    sbt -batch "runMain graft.bench.CorpusBench" 2>&1 | grep -E '"op"|failed|Exception in thread' | head -5
done
echo DONE_R10_5M

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK

/** Bounded top-k as an AGGREGATE — the alternative to
  * `row_number().over(Window.partitionBy(g).orderBy(s)) <= k`, backed by
  * Spark's own `CollectTopK` (the engine's nlargest/nsmallest primitive:
  * an `ObjectHashAggregate` with a `BoundedPriorityQueue` buffer, memory
  * k per group by construction).
  *
  * When it wins: partitions that locally hold many rows per group
  * (c ≫ k within a partition) — partial combine then ships at most k rows
  * per (group, partition) through the exchange instead of all of them.
  *
  * When it does NOT (measured, docs/corpusbench_local32.jsonl knn_join vs
  * knn_join_topk): if each group's rows are scattered ~k-or-fewer per
  * partition — the k-NN candidate shape — partial combine compresses
  * nothing, the exchange carries the same bytes plus queue-serialization
  * overhead, and past the 128-group threshold the object agg sort-falls-
  * back over the exploded stream; the plain window sort was faster at
  * every corpus scale (5k/50k/500k: 0.77/1.81/20.1 s vs 0.85/2.30/27.1 s).
  * Measure before choosing. */
object TopK {

  /** Collect the top `num` values of `e` per group. `reverse = false`:
    * the `num` LARGEST, returned descending; `reverse = true`: the `num`
    * SMALLEST, returned ascending. Order ties (and composite orderings)
    * by passing a struct — struct ordering is lexicographic by field. */
  def collect_top_k(e: Column, num: Int, reverse: Boolean): Column =
    GraftBridge.toColumn(
      new CollectTopK(GraftBridge.toExpression(e), num, reverse)
        .toAggregateExpression())
}

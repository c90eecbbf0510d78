package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's documented ad-hoc scan/predicate workload as typed
  * functions (reference: temp.md:39-105 — varchar equality, timestamp
  * equality/range/BETWEEN, LIKE-contains at three selectivities, conjunctive
  * composites, and predicated `SELECT * LIMIT n`).
  *
  * All shapes are single-pass scans: Catalyst pushes the predicates into the
  * Parquet reader (min/max row-group skipping + dictionary filtering), prunes
  * columns to the referenced set, and answers `count` without materializing
  * rows — the same plan shape Trino ran, minus the coordinator hop. At 100 TB
  * these stay embarrassingly parallel: no shuffle except the final count
  * combine.
  */
object Workload {

  /** COUNT(*) WHERE col = value (reference: temp.md:42-57). */
  def countWhereEq(df: DataFrame, c: String, value: Any): DataFrame =
    df.filter(col(c) === lit(value)).agg(count(lit(1)).as("cnt"))

  /** COUNT(*) WHERE ts in [lo, hi] (reference: temp.md:59-82). */
  def countWhereBetween(df: DataFrame, c: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(c).between(lit(lo), lit(hi))).agg(count(lit(1)).as("cnt"))

  /** COUNT(*) WHERE col LIKE '%needle%' (reference: temp.md:84-94). */
  def countWhereContains(df: DataFrame, c: String, needle: String): DataFrame =
    df.filter(col(c).contains(needle)).agg(count(lit(1)).as("cnt"))

  /** Conjunctive composite COUNT (reference: temp.md:96-105). */
  def countComposite(df: DataFrame, preds: Seq[Column]): DataFrame =
    df.filter(preds.reduce(_ && _)).agg(count(lit(1)).as("cnt"))

  /** Predicated row retrieval with deterministic order (reference's
    * `SELECT * … LIMIT 10`, temp.md:39-66, made order-stable for testing). */
  def selectWhereLimit(df: DataFrame, pred: Column, orderCol: String, n: Int): DataFrame =
    df.filter(pred).orderBy(col(orderCol)).limit(n)

  /** `SELECT * WHERE p LIMIT n` via two-phase late materialization.
    *
    * Spark's vectorized Parquet reader decodes every projected column of
    * every scanned batch — a `SELECT *` limit over a wide table pays a
    * full-width decode even when the filter matches almost nothing (measured
    * 50-100× slower than the equivalent COUNT on a 90-column table). Phase 1
    * scans only (filter column, id) and takes n matching ids; phase 2
    * refetches those rows through an `IN` filter on `idCol`, which pushes to
    * parquet row-group statistics — with sequentially-generated ids the
    * min/max ranges are tight, so the wide decode touches only the few row
    * groups that contain hits. Same result, scan cost ∝ hits instead of
    * table width × table size.
    */
  def selectWhereLimitLateMat(df: DataFrame, pred: Column, idCol: String, n: Int): DataFrame = {
    // Phase 1 as orderBy+limit → TakeOrderedAndProject: per-partition top-n
    // heaps in ONE parallel pass over the 2-column scan. A bare `limit(n)`
    // would run CollectLimit's serial partition waves (1×, 4×, 16× …) —
    // pathological when the predicate matches fewer than n rows, because
    // every wave must be exhausted before the next is scheduled.
    val ids = df.filter(pred).select(col(idCol)).orderBy(col(idCol)).limit(n)
      .collect().map(_.get(0))
    if (ids.isEmpty) df.filter(lit(false))
    else df.filter(col(idCol).isin(ids.toIndexedSeq: _*))
  }
}

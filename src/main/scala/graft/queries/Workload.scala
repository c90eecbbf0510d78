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
}

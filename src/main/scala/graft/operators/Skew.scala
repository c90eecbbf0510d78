package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for skewed keys — the complement to AQE's runtime
  * skew-join splitting (which only rewrites sort-merge joins it can observe
  * after a stage materializes; a skewed hash aggregation or a broadcast-
  * ineligible hot-key join still serializes onto one reducer without help).
  *
  * Salts are deterministic (derived from row content via xxhash64, never
  * `rand()`), so task retries and speculative attempts reproduce identical
  * partitioning — the same invariant the data generator maintains.
  */
object Skew {

  private def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int")

  /** Two-level skew-safe sum/count: aggregate (key, salt) partials first —
    * a hot key spreads over `salts` reducers — then merge by key. Exact for
    * the algebraic aggregates used (sum, count). Output columns:
    * keyCols ++ valueCols.map("sum_" + _) :+ "n_rows". */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val partial = df
      .withColumn("__salt", saltCol(df, salts))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        valueCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        valueCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
      .select((keyCols.map(col) ++ valueCols.map(c => col(s"sum_$c")) :+ col("n_rows")): _*)
  }

  /** Skew-safe equi-join: the big (skewed) side gets a content-derived salt
    * in [0, salts); the small-but-not-broadcastable side is replicated once
    * per salt; the join keys become (key, salt). Row-for-row identical to
    * `big.join(small, key)` — each big row meets exactly one replica — but a
    * hot key fans out across `salts` tasks instead of one.
    *
    * `joinType` supports "inner" and "left" (semantics preserved: a big row
    * with no match still emits once with nulls). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left").contains(joinType), s"unsupported joinType $joinType")
    val saltedBig = big.withColumn("__salt", saltCol(big, salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s)): _*)))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

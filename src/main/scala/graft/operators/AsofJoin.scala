package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark SQL lacks natively.
  *
  * For every left row, attach the payload of the *latest* right row with
  * `right.ts <= left.ts` within the same key (the standard trade-enrichment
  * / feature-lookup shape). A naive formulation joins on the key with a
  * range predicate and keeps the max — O(left × right-per-key) intermediate
  * rows. This one is linear: tag and union both sides, sort each key's
  * timeline once, and forward-fill the right payload with
  * `last(_, ignoreNulls)` over the running window — one shuffle + sort
  * total, state bounded by the window frame, no candidate explosion. Right
  * rows order before left rows at equal timestamps, so `<=` (inclusive)
  * semantics hold.
  *
  * Expressed entirely with built-in window expressions, so it is
  * SQL-mirrorable — the DuckDB oracle (q44) runs the identical union+fill
  * formulation.
  */
object AsofJoin {

  /** Left as-of join. `right` must be unique per (key, ts) — pre-aggregate
    * otherwise (ambiguous ties have no well-defined "the" latest row).
    * Output: all `left` columns plus `right`'s payload columns (null when no
    * right row precedes). */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String
  ): DataFrame = {
    val payload = right.columns.filterNot(c => c == keyCol || c == rightTsCol)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val leftCols = left.columns

    val l = payload.foldLeft(
      left.withColumn("__t", col(leftTsCol)).withColumn("__side", lit(1))) {
      case (df, c) =>
        df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r = leftCols.filterNot(c => c == keyCol).foldLeft(
      right.withColumn("__t", col(rightTsCol)).withColumn("__side", lit(0))
        .drop(rightTsCol)) {
      case (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r.select(l.columns.map(col): _*))) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}

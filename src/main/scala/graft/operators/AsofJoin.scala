package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * All payload columns are filled as ONE struct, not independently: a right
  * row is packed into a single non-null struct (its fields may be null), so
  * the forward fill always selects the whole latest row. Filling columns
  * one-by-one would stitch values from different right rows whenever a
  * newer row carries a legitimate NULL payload value.
  *
  * Expressed entirely with built-in window expressions, so it is
  * SQL-mirrorable — the DuckDB oracle (q44) runs the identical
  * union+struct-fill formulation.
  */
object AsofJoin {

  /** Left as-of join. `right` must be unique per (key, ts) — pre-aggregate
    * otherwise (ambiguous ties have no well-defined "the" latest row).
    * Output: all `left` columns plus `right`'s payload columns (all null
    * when no right row precedes). */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String
  ): DataFrame = {
    val payload = right.columns.filterNot(c => c == keyCol || c == rightTsCol)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val collisions = left.columns.intersect(payload)
    require(collisions.isEmpty,
      s"left already has column(s) ${collisions.mkString(", ")} — rename the " +
        "right payload before the as-of join (silent overwrite is never wanted)")
    val leftCols = left.columns

    val pType = StructType(payload.map(right.schema(_)))
    val l = left
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val r = right.select(
      col(keyCol),
      col(rightTsCol).as("__t"),
      lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))

    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(c)): _*)
  }
}

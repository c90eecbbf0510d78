package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — `left.point BETWEEN right.lo AND right.hi` —
  * another operator Spark executes badly out of the box (a non-equi join
  * falls back to broadcast-nested-loop or a cartesian + filter).
  *
  * Bin bucketization makes it an equi-join: intervals explode to every
  * fixed-width bin they overlap, points map to their one bin, the join runs
  * on the bin id, and an exact containment filter drops bin-edge false
  * positives. Cost is O(matches + intervals × span/binWidth) — tune
  * `binWidth` toward the typical interval span so the per-interval
  * replication factor stays small. Shuffles once per side on the bin id;
  * never quadratic.
  */
object RangeJoin {

  /** Inner point-in-interval join over numeric (long-compatible) columns.
    * Output: all left columns + all right columns. */
  def pointInInterval(
      left: DataFrame,
      pointCol: String,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val rb = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}

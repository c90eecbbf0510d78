package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
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

  /** Exact `floorDiv(c, w)` over longs. `floor(c / w)` would divide in
    * DOUBLE, whose 53-bit mantissa mis-rounds values at or above 2^53
    * (e.g. nanosecond epochs) and can bin a point outside the bins its
    * interval exploded to — silently dropping matches. Truncating
    * integer-divide, then step one bin down for negative non-multiples.
    * Every intermediate stays in Long range — including c = Long.MinValue:
    * q*w = c - (c % w) lies in [c, 0] for negative c, and q-1 only fires
    * when the remainder is nonzero, which requires w >= 2 and hence
    * q >= Long.MinValue/2. (The earlier `lc - pmod(lc, w)` formulation
    * underflowed for points within w-1 of Long.MinValue: pmod is
    * non-negative, so the subtraction left the Long range — an ANSI throw
    * mid-query, or a silent wrong bin without ANSI.) */
  private def floorDivBin(c: Column, w: Long): Column = {
    val lc = c.cast("long")
    val q = GraftBridge.toColumn(IntegralDivide(
      GraftBridge.toExpression(lc), GraftBridge.toExpression(lit(w))))
    val r = lc - q * lit(w)
    when(lc < 0 && r =!= 0, q - lit(1L)).otherwise(q)
  }

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
    val lb = left.withColumn("__bin", floorDivBin(col(pointCol), binWidth))
    val rb = right.withColumn("__bin",
      explode(sequence(floorDivBin(col(loCol), binWidth),
        floorDivBin(col(hiCol), binWidth))))
    lb.join(rb, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking and ntile without a single-partition sort.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole input
  * onto one task — acceptable on a dimension table (q52), a scale-killer on
  * a fact table. The classic distributed-exact alternative implemented here:
  *
  *   1. `repartitionByRange` on the sort key — one range shuffle, the same
  *      exchange a global `orderBy` would plan;
  *   2. `sortWithinPartitions` — per-partition Tungsten sort, all
  *      partitions in parallel;
  *   3. a lightweight counting job over the sorted partitions (touches the
  *      shuffle output, returns one long per partition — the only
  *      driver-side state, O(numPartitions) not O(rows));
  *   4. global rank = broadcast per-partition offset + local row position,
  *      stamped in a single `mapPartitionsWithIndex` pass.
  *
  * The range shuffle is written once: the counting job materializes it and
  * the ranking job re-reads the same shuffle files (Spark marks the stage
  * as skipped), so total cost is one shuffle + one extra pass over sorted
  * rows — this is also exactly how `RDD.zipWithIndex` works internally.
  *
  * Rank is dense-free (`row_number` semantics): ties must be broken by the
  * caller's sort columns for a deterministic result, same contract as a
  * window `row_number`.
  */
object Rank {

  /** Append a 1-based global `row_number`-style rank column ordered by
    * `sortCols`. Exact at any scale; one range shuffle. `numPartitions`
    * defaults to the session's default parallelism — at cluster scale pass
    * something proportional to input size so each sorted partition fits in
    * task memory. */
  def withGlobalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String = "rank",
      numPartitions: Int = 0
  ): DataFrame = rankAndCount(df, sortCols, rankCol, numPartitions)._1

  /** Exact NTILE(n) over a global order, scale-safe. Output = input columns
    * plus `tileCol` (1..n), with standard SQL NTILE semantics: with N rows,
    * the first N mod n tiles hold ceil(N/n) rows, the rest floor(N/n). */
  def exactNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      n: Int,
      tileCol: String = "tile",
      numPartitions: Int = 0
  ): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val (ranked, total) = rankAndCount(df, sortCols, "__rank", numPartitions)
    val q = total / n
    val r = total % n
    // rank <= r*(q+1) → one of the r big tiles, else one of the small ones.
    // `div` (integral divide) keeps the whole computation in longs; the
    // small-tile branch guards q=0 (N < n: every row lands in a big tile).
    val bigSpan = lit(r * (q + 1))
    val tile = when(col("__rank") <= bigSpan,
        expr(s"(__rank - 1) div ${q + 1}") + 1L)
      .otherwise(lit(r) + expr(s"(__rank - 1 - ${r * (q + 1)}) div ${math.max(q, 1L)}") + 1L)
    ranked.withColumn(tileCol, tile.cast("long")).drop("__rank")
  }

  private def rankAndCount(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String,
      numPartitions: Int
  ): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "global rank needs at least one sort column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd
    val counts: Array[Long] = spark.sparkContext.runJob(rdd,
      (it: Iterator[Row]) => {
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      })
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = bOffsets.value(pid)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    (spark.createDataFrame(stamped, df.schema.add(rankCol, LongType, nullable = false)),
      total)
  }
}

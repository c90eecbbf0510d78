package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MoneySum.money_sum
import graft.sources.TestTables

/** Same-session interleaved A/B of the keyed-widen variants for q01/q10/q20
  * (alternating run order, so JIT/window drift cannot bias one side). Not
  * part of the benchmark protocol. */
object WidenAbProbe {
  private def ts(s: String) = to_timestamp(lit(s))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-widenab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nParts = spark.sessionState.conf.numShufflePartitions

    def q01(widen: Boolean): DataFrame = {
      val li0 = TestTables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= ts("1998-09-01 00:00:00"))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_orderkey"))
      val li = if (widen) li0.repartition(nParts, col("l_orderkey")) else li0
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money_sum(col("l_quantity")).as("sum_qty"),
          money_sum(col("l_extendedprice")).as("sum_base_price"),
          money_sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          money_sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          round(money_sum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(money_sum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
          round(money_sum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .coalesce(1)
        .sortWithinPartitions(col("l_returnflag"), col("l_linestatus"))
    }
    def q10(widen: Boolean): DataFrame = {
      val o0 = TestTables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val o = if (widen) o0.repartition(nParts, col("o_custkey")) else o0
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }
    def q20(widen: Boolean): DataFrame = {
      val e0 = TestTables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"))
      val e = if (widen) e0.repartition(nParts, col("user_id")) else e0
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for ((name, mk) <- Seq[(String, Boolean => DataFrame)](
        "q01" -> q01, "q10" -> q10, "q20" -> q20)) {
      // warm both variants
      runNoop(mk(false)); runNoop(mk(true))
      runNoop(mk(false)); runNoop(mk(true))
      val base = collection.mutable.ArrayBuffer[Double]()
      val wide = collection.mutable.ArrayBuffer[Double]()
      for (r <- 1 to rounds) {
        if (r % 2 == 0) { base += runNoop(mk(false)); wide += runNoop(mk(true)) }
        else { wide += runNoop(mk(true)); base += runNoop(mk(false)) }
      }
      println(f"[widenab] $name base min=${base.min}%.4f mean=${base.sum / base.size}%.4f " +
        base.map(x => f"$x%.3f").mkString("[", ",", "]"))
      println(f"[widenab] $name wide min=${wide.min}%.4f mean=${wide.sum / wide.size}%.4f " +
        wide.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MoneySum.money_sum
import graft.operators.Stage
import graft.sources.TestTables

/** Scratch probe: narrow-arrival parallelism for the SQL-family headline
  * queries (q01 3-split lineitem scan, q10 1-split orders window, q20
  * 2-task AQE-coalesced sessionize window). Measures the wide-born
  * alternatives before any production change. Not part of the benchmark
  * protocol. */
object WidenProbe {
  private def ts(s: String) = to_timestamp(lit(s))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-widenprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nParts = spark.sessionState.conf.numShufflePartitions

    def q01(widen: Int): DataFrame = {
      val li0 = TestTables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= ts("1998-09-01 00:00:00"))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_orderkey"))
      val li = widen match {
        case 0 => li0
        case 1 => Stage.ensureWide(li0) // round-robin (pays determinism sort)
        case 2 => li0.repartition(nParts, col("l_orderkey")) // hash, no sort
      }
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
      val o = if (widen)
        o0.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .repartition(nParts, col("o_custkey"))
      else o0
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }

    def q20(widen: Boolean): DataFrame = {
      val e0 = TestTables.events(spark, sfDir).select(col("user_id"), col("ts"))
      val e = if (widen) e0.repartition(nParts, col("user_id")) else e0
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
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
    def hashOf(df: DataFrame): Long = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head().getLong(0)
    }

    // q01/q20 outputs are ordered; compare as ordered lists via collect
    assert(q01(0).collect().toSeq == q01(1).collect().toSeq, "q01 widen=1 diverged")
    assert(q01(0).collect().toSeq == q01(2).collect().toSeq, "q01 widen=2 diverged")
    assert(hashOf(q10(false)) == hashOf(q10(true)), "q10 diverged")
    assert(q20(false).collect().toSeq == q20(true).collect().toSeq, "q20 diverged")
    println("[widenprobe] all equivalence checks OK")

    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "q01_base" -> (() => q01(0)),
        "q01_roundrobin" -> (() => q01(1)),
        "q01_hashkey" -> (() => q01(2)),
        "q10_base" -> (() => q10(false)),
        "q10_widen" -> (() => q10(true)),
        "q20_base" -> (() => q20(false)),
        "q20_widen" -> (() => q20(true)))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      val ts0 = (1 to iters).map(_ => runNoop(mk()))
      println(f"[widenprobe] $name min=${ts0.min}%.4f mean=${ts0.sum / ts0.size}%.4f " +
        ts0.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

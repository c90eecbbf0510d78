package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry

/** Generic per-query stage attribution: runs declared queries under the
  * Bench session config with a stage listener and min-of-N timing.
  * Env: PROBE_Q=q01_pricing_summary,q07_join_agg  PROBE_ITERS=5.
  * Not part of the benchmark protocol. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
    val names = sys.env.getOrElse("PROBE_Q", "q01_pricing_summary")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new Q23Probe.StageTally
    spark.sparkContext.addSparkListener(tally)

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names if SparkEntry.queries.contains(name)) {
      def mk() = SparkEntry.queries(name)(spark, sfDir)
      (1 to 2).foreach(_ => runNoop(mk()))
      tally.rows.clear()
      val t = runNoop(mk())
      println(f"[qprobe] $name instrumented run $t%.3f s, stages:")
      tally.rows.foreach(println)
      val ts = (1 to iters).map(_ => runNoop(mk()))
      println(f"[qprobe] $name min=${ts.min}%.4f mean=${ts.sum / ts.size}%.4f " +
        ts.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

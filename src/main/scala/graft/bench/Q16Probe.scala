package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Stage, TextOps}
import graft.sources.TestTables

/** Scratch diagnostic for q16_token_stats (r16 verdict item 7): stage-split
  * attribution of the 0.18–0.23 s bench figure — session fixed cost vs text
  * expression CPU. Not part of the benchmark protocol. */
object Q16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-q16probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new Q23Probe.StageTally
    spark.sparkContext.addSparkListener(tally)

    val docs = TestTables.documents(spark, sfDir)
    def q16 = {
      val d = Stage.ensureWide(docs.select(col("doc_id"), col("text")))
      d.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextOps.avgWordLen(col("text")).as("avg_word_len"),
        TextOps.punctRatio(col("text")).as("punct_ratio"))
    }
    // decomposition: bare scan+noop, scan+widen, widen+each expression
    def bare = docs.select(col("doc_id"), length(col("text")).cast("long").as("n"))
    def widened = Stage.ensureWide(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    def narrowExprs = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextOps.avgWordLen(col("text")).as("avg_word_len"),
      TextOps.punctRatio(col("text")).as("punct_ratio"))

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "q16_full" -> (() => q16),
        "scan_only" -> (() => bare),
        "scan_widen" -> (() => widened),
        "exprs_no_widen" -> (() => narrowExprs))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      val ts = (1 to iters).map(_ => runNoop(mk()))
      println(f"[q16probe] $name min=${ts.min}%.4f mean=${ts.sum / ts.size}%.4f " +
        ts.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    (1 to 2).foreach(_ => runNoop(q16))
    tally.rows.clear()
    val t = runNoop(q16)
    println(f"[q16probe] q16 instrumented run $t%.3f s, stages:")
    tally.rows.foreach(println)
    spark.stop()
  }
}

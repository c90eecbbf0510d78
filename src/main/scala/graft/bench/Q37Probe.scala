package graft.bench

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Stage, TextOps}
import graft.sources.TestTables

/** Scratch diagnostic for q37_bm25's residual full-corpus branches (r16
  * verdict item 6): the dfreq branch (tokenize + array_distinct + explode +
  * partial count) and the stats branch (tokenize + size) both run inside
  * the corpus's arrival splits — one file split at headline scale. Measures
  * the wide-born reorder on each. Not part of the benchmark protocol. */
object Q37Probe {

  final class StageTally extends SparkListener {
    val rows = mutable.ArrayBuffer[String]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
      val m = si.taskMetrics
      rows += f"    stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${wall}%5d ms " +
        f"exec=${m.executorRunTime}%6d ms cpu=${m.executorCpuTime / 1000000}%6d ms"
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-q37probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new StageTally
    spark.sparkContext.addSparkListener(tally)

    val d = TestTables.documents(spark, sfDir)

    def bm25(wideDfreq: Boolean, wideStats: Boolean): DataFrame = {
      val terms = d.select(col("doc_id"),
        explode(TextOps.tokens(lower(col("text")))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dl = d.filter(col("text").isNotNull).select(col("doc_id"),
        size(TextOps.tokens(lower(col("text")))).cast("long").as("dl"))
      val statsSrc =
        if (wideStats)
          Stage.ensureWide(d.filter(col("text").isNotNull)
              .select(col("doc_id"), col("text")))
            .select(col("doc_id"),
              size(TextOps.tokens(lower(col("text")))).cast("long").as("dl"))
        else dl
      val stats = statsSrc.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val dfreqSrc =
        if (wideDfreq) Stage.ensureWide(d.select(col("text")))
        else d
      val dfreq = dfreqSrc.select(
          explode(array_distinct(TextOps.tokens(lower(col("text"))))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("bm25",
          round(col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / col("avgdl"))), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("bm25").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3 && col("doc_id") < 50)
        .select(col("doc_id"), col("term"), col("bm25"), col("rank"))
    }

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def hashOf(df: DataFrame): Long =
      df.select(xxhash64(col("doc_id"), col("term"), col("bm25"), col("rank")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    def x0 = bm25(wideDfreq = false, wideStats = false)
    def x1 = bm25(wideDfreq = true, wideStats = false)
    def x2 = bm25(wideDfreq = true, wideStats = true)

    val h0 = hashOf(x0)
    for ((name, df) <- Seq("x1" -> x1, "x2" -> x2)) {
      val h = hashOf(df)
      println(s"[q37probe] $name hash ${if (h == h0) "OK" else s"MISMATCH $h vs $h0"}")
    }
    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "x0" -> (() => x0), "x2" -> (() => x2))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      tally.rows.clear()
      val t = runNoop(mk())
      println(f"[q37probe] $name instrumented run $t%.3f s, stages:")
      tally.rows.foreach(println)
    }
    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "x0" -> (() => x0), "x1" -> (() => x1), "x2" -> (() => x2))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      val ts = (1 to iters).map(_ => runNoop(mk()))
      println(f"[q37probe] $name min=${ts.min}%.4f mean=${ts.sum / ts.size}%.4f " +
        ts.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

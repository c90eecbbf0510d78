package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Scratch diagnostic: per-stage shuffle/spill attribution for the winnow
  * span-dedup pipeline at corpus scale. Not part of the recorded grid. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new CorpusBench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val path = sys.env.getOrElse("CORPUS_PATH", "/tmp/graft_corpus/docs_500000")
    val docs = spark.read.parquet(path)

    def stage(name: String)(act: => Long): Unit = {
      val w0 = tally.written.get; val s0 = tally.spilled.get
      val t0 = System.nanoTime()
      val out = act
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        f"rows=$out%-12d shuffle=${(tally.written.get - w0) / 1e6}%8.1f MB  " +
        f"spill=${(tally.spilled.get - s0) / 1e6}%8.1f MB")
    }

    val t = docs.select(col("doc_id").as("id"), col("text").as("s"))
      .filter(length(col("s")) >= 20)
    stage("winnow_windows")(TextOps.probeWinnowWindows(t, 20, 5).count())
    stage("window_freqs")(TextOps.probeWindowFreqs(t, 20, 5).count())
    stage("gated_instances")(TextOps.probeGatedInstances(t, 20, 5).count())
    stage("merged_arrays")(TextOps.probeMergedArrays(t, 20, 5).count())
    stage("full_dup_spans")(
      TextOps.dupSpanStats(docs, "doc_id", "text", winLen = 20, winnowK = 5)
        .agg(sum(col("removed_chars"))).head().getLong(0))
    spark.stop()
  }
}

package graft.bench

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions
import graft.operators.{Dedup, Stage}
import graft.sources.TestTables

/** Scratch diagnostic for q21_minhash_pairs (r16 verdict item 3): the static
  * plan computes the fused minhash signature pipeline FOUR times (band join
  * left shuffle + band join broadcast + two attach broadcasts). Measures the
  * alternatives. Not part of the benchmark protocol. */
object Q21Probe {

  final class StageTally extends SparkListener {
    val rows = mutable.ArrayBuffer[String]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
      val m = si.taskMetrics
      rows += f"    stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${wall}%5d ms " +
        f"exec=${m.executorRunTime}%6d ms cpu=${m.executorCpuTime / 1000000}%6d ms " +
        f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1024}%8d KB " +
        f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1024}%8d KB"
    }
  }

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-q21probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new StageTally
    spark.sparkContext.addSparkListener(tally)

    val docs = TestTables.documents(spark, sfDir)
    val numHashes = 64
    val bands = 16
    val rowsPerBand = numHashes / bands
    val threshold = 0.5
    val shingleLen = 3

    // NOTE: Dedup.tokenFrame is private; replicate it
    def sigOf(d: DataFrame): DataFrame =
      Stage.ensureWide(d.select(col("doc_id").as("id"), col("text").as("text")))
        .select(col("id"), toks(col("text")).as("tk"))
        .select(col("id"),
          HashExpressions.minhash_shingles(col("tk"), shingleLen, numHashes).as("sig"))

    def rest(sig: DataFrame, bandedOverride: Option[DataFrame] = None,
        shuffleBand: Boolean = false): DataFrame = {
      val bandBuckets = array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)
      val rawBanded = sig.select(col("id"), posexplode(bandBuckets))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val banded = bandedOverride.getOrElse(
        if (shuffleBand)
          rawBanded.repartition(
            spark.sessionState.conf.numShufflePartitions, col("band"), col("bucket"))
        else rawBanded)
      val l = banded.as("l")
      val r = banded.as("r")
      val rawPairs = l
        .join(if (shuffleBand) r.hint("SHUFFLE_HASH") else r,
          col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
        .filter(col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      val candidates = rawPairs.distinct()
      val sigAttach = broadcast(sig)
      candidates
        .join(sigAttach.as("sa"), col("id_a") === col("sa.id"))
        .join(sigAttach.as("sb"), col("id_b") === col("sb.id"))
        .select(col("id_a"), col("id_b"),
          round(HashExpressions.signature_agreement(col("sa.sig"), col("sb.sig")), 6)
            .as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
    }

    def w0 = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = numHashes, bands = bands, threshold = threshold)
    // signature materialized once per invocation; every consumer reads the
    // checkpointed rows instead of recomputing scan->tokenize->signature
    def w1 = rest(sigOf(docs).localCheckpoint())
    // no materialization: band join as one canonical shuffled frame
    // (ReusedExchange) instead of the broadcast that recomputes
    def w2 = rest(sigOf(docs), shuffleBand = true)

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def hashOf(df: DataFrame): Long =
      df.select(xxhash64(col("id_a"), col("id_b"), col("est_jaccard")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    println(s"[q21probe] result rows=${w0.count()}")
    val h0 = hashOf(w0)
    for ((name, df) <- Seq("w1" -> w1, "w2" -> w2)) {
      val h = hashOf(df)
      println(s"[q21probe] $name hash ${if (h == h0) "OK" else s"MISMATCH $h vs $h0"}")
    }

    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "w0" -> (() => w0), "w1" -> (() => w1), "w2" -> (() => w2))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      tally.rows.clear()
      val t = runNoop(mk())
      println(f"[q21probe] $name instrumented run $t%.3f s, ${tally.rows.size} stages:")
      tally.rows.foreach(println)
    }

    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "w0" -> (() => w0), "w1" -> (() => w1), "w2" -> (() => w2))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      val ts = (1 to iters).map(_ => runNoop(mk()))
      println(f"[q21probe] $name min=${ts.min}%.4f mean=${ts.sum / ts.size}%.4f " +
        ts.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

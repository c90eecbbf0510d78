package graft.bench

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions
import graft.operators.{Dedup, Stage}
import graft.sources.TestTables

/** Scratch diagnostic for the q23_ngram_pairs floor (r16 verdict item 1):
  * per-stage wall attribution of the current plan plus min-of-N timing of
  * candidate restructurings. Not part of the benchmark protocol. */
object Q23Probe {

  /** Records (stageId, name, numTasks, wallMs, shuffleReadMB, shuffleWriteMB,
    * outputRows?) per completed stage. */
  final class StageTally extends SparkListener {
    val rows = mutable.ArrayBuffer[String]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
      val m = si.taskMetrics
      rows += f"    stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${wall}%5d ms " +
        f"exec=${m.executorRunTime}%6d ms cpu=${m.executorCpuTime / 1000000}%6d ms " +
        f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1024}%8d KB " +
        f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1024}%8d KB  ${si.name.take(60)}"
    }
  }

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-q23probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new StageTally
    spark.sparkContext.addSparkListener(tally)

    val docs = TestTables.documents(spark, sfDir)
    val threshold = 0.3
    val shingleLen = 3
    val maxShingleFreq = 1000

    // ---- shared pipeline pieces (small-path shapes) ----
    def tf = Stage.ensureWide(docs.select(col("doc_id").as("id"), col("text").as("text")))
      .select(col("id"), toks(col("text")).as("tk"))
    def sh = tf
      .select(col("id"), HashExpressions.shingle_hashes(col("tk"), shingleLen).as("shs"))
      .select(col("id"), size(col("shs")).as("n_sh"), explode_outer(col("shs")).as("sh_h"))
      .filter(col("sh_h").isNotNull)
    def postingsOf(shs: DataFrame) = shs.groupBy(col("sh_h"))
      .agg(graft.functions.CappedPostings
        .capped_postings(col("id"), col("n_sh"), maxShingleFreq).as("docs"))
      .filter(col("docs").isNotNull && size(col("docs")) >= 2)
    def doubleExplode(postings: DataFrame) = postings
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
    def finish(pairs: DataFrame) = pairs
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)

    // ---- variants ----
    val nParts = spark.sessionState.conf.numShufflePartitions
    def v0 = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = threshold)
    // only the pair stream pinned to an explicit count (AQE cannot coalesce)
    def vA = finish(doubleExplode(postingsOf(sh))
      .repartition(nParts, col("id_a"), col("id_b")))
    // only the posting exchange pre-keyed at an explicit count
    def vB = finish(doubleExplode(postingsOf(
      sh.repartition(nParts, col("sh_h")))))
    // both pinned — the large-path shape at the session floor
    def vC = finish(doubleExplode(postingsOf(
      sh.repartition(nParts, col("sh_h"))))
      .repartition(nParts, col("id_a"), col("id_b")))
    // vA + redistribute the (small) postings frame before the double-explode,
    // so the explode expansion runs at session width instead of the 4
    // AQE-coalesced tasks of the posting exchange
    def vD = finish(doubleExplode(
      postingsOf(sh).repartition(nParts))
      .repartition(nParts, col("id_a"), col("id_b")))
    // like vD but hash-keyed redistribution (no round-robin determinism sort)
    def vE = finish(doubleExplode(
      postingsOf(sh).repartition(nParts, col("sh_h")))
      .repartition(nParts, col("id_a"), col("id_b")))
    // gated postings: pinned sh_h exchange; codegen freq count + in-stage
    // shuffled-hash semi-gate drops singleton groups BEFORE the object agg
    def vG = {
      val shK = sh.repartition(nParts, col("sh_h"))
      val freqs = shK.groupBy(col("sh_h")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 2 && col("freq") <= maxShingleFreq)
        .select(col("sh_h"))
      val gated = shK.join(freqs.hint("SHUFFLE_HASH"), "sh_h")
        .select(col("id"), col("n_sh"), col("sh_h"))
      val postings = gated.groupBy(col("sh_h"))
        .agg(graft.functions.CappedPostings
          .capped_postings(col("id"), col("n_sh"), maxShingleFreq).as("docs"))
        .filter(col("docs").isNotNull && size(col("docs")) >= 2)
      finish(doubleExplode(postings)
        .repartition(nParts, col("id_a"), col("id_b")))
    }
    // join formulation as shipped (ngramJaccardJoin)
    def vJ0 = Dedup.ngramJaccardJoin(docs, "doc_id", "text", threshold = threshold)
    // tuned join formulation: pinned sh_h exchange, broadcast freq gate,
    // shuffled-hash self join, pinned pair exchange — fully codegen, no
    // ObjectHashAggregate anywhere
    def vJ1 = {
      val shK = sh.repartition(nParts, col("sh_h"))
      val freqs = shK.groupBy(col("sh_h")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 2 && col("freq") <= maxShingleFreq)
        .select(col("sh_h"))
      val filtered = shK.join(broadcast(freqs), "sh_h")
        .select(col("id"), col("n_sh"), col("sh_h"))
      val l = filtered.as("l")
      val r = filtered.as("r")
      val pairs = l.join(r.hint("SHUFFLE_HASH"), col("l.sh_h") === col("r.sh_h"))
        .filter(col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          col("l.n_sh").as("n_a"), col("r.n_sh").as("n_b"))
        .repartition(nParts, col("id_a"), col("id_b"))
      finish(pairs)
    }

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def hashOf(df: DataFrame): Long =
      df.select(xxhash64(col("id_a"), col("id_b"), col("jaccard")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    // ---- 0. volumes ----
    println(s"[q23probe] docs=${docs.count()}")
    println(s"[q23probe] exploded shingle rows=${sh.count()}")
    println(s"[q23probe] distinct sh_h=${sh.select(col("sh_h")).distinct().count()}")
    println(s"[q23probe] rows in groups>=2=" +
      sh.groupBy(col("sh_h")).count().filter(col("count") >= 2)
        .agg(sum(col("count"))).head().get(0))
    println(s"[q23probe] postings(>=2)=${postingsOf(sh).count()}")
    println(s"[q23probe] pair stream rows=${doubleExplode(postingsOf(sh)).count()}")
    println(s"[q23probe] result rows=${v0.count()}")

    // ---- 1. result equivalence (cheap guard before timing) ----
    val h0 = hashOf(v0)
    for ((name, df) <- Seq("vA" -> vA, "vG" -> vG)) {
      val h = hashOf(df)
      println(s"[q23probe] $name hash ${if (h == h0) "OK" else s"MISMATCH $h vs $h0"}")
    }

    // ---- 2. plan shapes (static formatted explain: agg/exchange nodes) ----
    for ((name, df) <- Seq("v0" -> v0, "vB" -> vB, "vC" -> vC)) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val agg = plan.linesIterator.filter(l =>
        l.contains("Aggregate") || l.contains("Exchange") || l.contains("Generate"))
        .map(_.trim.take(110)).mkString("\n    ")
      println(s"[q23probe] $name plan agg/exchange nodes:\n    $agg")
    }

    // ---- 3. per-stage attribution ----
    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "vG" -> (() => vG))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      tally.rows.clear()
      val t = runNoop(mk())
      println(f"[q23probe] $name instrumented run $t%.3f s, stages:")
      tally.rows.foreach(println)
    }

    // ---- 4. min-of-N timing ----
    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "v0" -> (() => v0), "vA" -> (() => vA), "vG" -> (() => vG))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      val ts = (1 to iters).map(_ => runNoop(mk()))
      println(f"[q23probe] $name min=${ts.min}%.4f mean=${ts.sum / ts.size}%.4f " +
        ts.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

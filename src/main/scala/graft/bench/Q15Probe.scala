package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch diagnostic for the exact-dedup exchange bytes (r16 verdict item
  * 5): shuffle-byte + wall comparison of the classic key-keyed exact() plan
  * vs the slim hash-prekey exactCounts() plan at grid corpus sizes. Not part
  * of the benchmark protocol.
  *
  * Env: PROBE_N (default 5000000), CORPUS_DIR staging as in [[CorpusBench]].
  */
object Q15Probe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_N", "5000000").toLong
    val stageDir = sys.env.getOrElse("CORPUS_DIR", "/tmp/graft_corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-q15probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new CorpusBench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val path = s"$stageDir/docs_$n"
    if (!Files.exists(Paths.get(path)))
      CorpusBench.corpus(spark, n).write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)

    def run(tag: String, mk: () => DataFrame): Unit = {
      val w0 = tally.written.get; val s0 = tally.spilled.get
      val t0 = System.nanoTime()
      val df = mk()
      val out = df.count()
      println(f"[q15probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"rows=$out%-10d shuffle=${(tally.written.get - w0) / 1e6}%9.1f MB  " +
        f"spill=${(tally.spilled.get - s0) / 1e6}%9.1f MB")
    }
    def hashOf(df: DataFrame): Long =
      df.select(xxhash64(col("keep_id"), col("n_copies")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    def classic() = Dedup.exact(docs, "doc_id", Seq("text"))
      .select(col("keep_id"), col("n_copies"))
    def slim() = Dedup.exactCounts(docs, "doc_id", Seq("text"))

    // equivalence first
    val hc = hashOf(classic()); val hs = hashOf(slim())
    println(s"[q15probe] hash ${if (hc == hs) "OK" else s"MISMATCH $hc vs $hs"}")

    for (i <- 1 to 2) {
      run(s"classic_text_exchange#$i", classic)
      run(s"slim_hash_prekey#$i", slim)
    }
    spark.stop()
  }
}

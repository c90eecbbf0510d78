package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Protocol follows the reference's micro-bench scaffold — warmup then
  * measured iterations, mean reported (reference: bench/config.json:10-11).
  * Each query is forced end-to-end through the `noop` sink so timing covers
  * scan → compute → (discarded) write, not just the first row.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // two warmup runs: the first JITs the query's generated code, the second
    // runs it hot — one warmup still measures C1-compiled code on the
    // heavier queries and inflates the mean by ~20% run-to-run
    val warmup = sys.env.getOrElse("BENCH_WARMUP", "2").toInt
    val iters = sys.env.getOrElse("BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headline = Seq(
      "q01_pricing_summary", "q02_count_eq", "q03_count_ts_range", "q04_count_like",
      "q05_count_composite", "q06_select_limit", "q07_join_agg", "q10_window_topn",
      "q13_topk", "q15_dedup_exact", "q16_token_stats", "q18_langid", "q20_sessionize",
      "q21_minhash_pairs", "q23_ngram_pairs", "q24_cosine_topk", "q36_tfidf", "q37_bm25")
      .filter(SparkEntry.queries.contains)

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = headline.map { name =>
      try {
        (1 to warmup).foreach(_ => once(name))
        val times = (1 to iters).map(_ => once(name))
        name -> times.sum / iters
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"headline_total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir","warmup":$warmup,"iters":$iters}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Protocol follows the reference's micro-bench scaffold — warmup then
  * measured iterations (reference: bench/config.json:10-11). Each query is
  * forced end-to-end through the `noop` sink so timing covers
  * scan → compute → (discarded) write, not just the first row.
  *
  * The headline per-query number is the MIN of the measured iterations, not
  * the mean: min-of-N is the standard contention-robust estimator — a
  * co-tenant load spike can only ever inflate a wall-clock sample, never
  * deflate it, so the minimum is the sample least contaminated by machine
  * noise. (The round-3 artifact recorded a phantom 3–6× regression on the
  * two longest queries purely from co-tenant contention during the recorded
  * run; a quiet re-run of the identical commit was the fastest round yet.)
  * The mean and every raw iteration time are also emitted so an outlier is
  * visible in the artifact itself rather than needing a re-run to diagnose.
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
        name -> (1 to iters).map(_ => once(name))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> Seq.empty[Double]
      }
    }
    def obj(f: Seq[Double] => String) = results
      .map { case (k, ts) => "\"" + k + "\":" + (if (ts.isEmpty) "-1.0" else f(ts)) }
      .mkString("{", ",", "}")
    val qs = obj(ts => f"${ts.min}%.4f")
    val qsMean = obj(ts => f"${ts.sum / ts.length}%.4f")
    val qsIters = obj(_.map(t => f"$t%.4f").mkString("[", ",", "]"))
    val total = results.collect { case (_, ts) if ts.nonEmpty => ts.min }.sum
    val line =
      f"""{"metric":"headline_total","value":$total%.4f,"unit":"sec","queries":$qs,"queries_mean":$qsMean,"queries_iters":$qsIters,"sf":"$sfDir","warmup":$warmup,"iters":$iters,"estimator":"min"}"""
    println(line)
    // The stdout line arrives in the driver's log wrapped in sbt's "[info] "
    // prefix, which defeats a line-is-JSON parse — so the metric object also
    // lands in a dedicated file (BENCH_OUT, default repo-root
    // bench_metric.json) that survives any log mangling.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("BENCH_OUT", "bench_metric.json"))
    if (outPath.getParent != null) java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.writeString(outPath, line + "\n")
    spark.stop()
    // Belt-and-braces for the driver's tail parser: repeat the metric as the
    // very last stdout line, behind a stable greppable prefix (a bare JSON
    // line gets sbt's "[info] " prepended, so "last line parses as JSON"
    // never fires; a fixed prefix survives any log wrapper — strip
    // everything up to and including "BENCH_METRIC_JSON " and parse the
    // rest). Printed after spark.stop() so no shutdown logging follows it.
    println("BENCH_METRIC_JSON " + line)
  }
}

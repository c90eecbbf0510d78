package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.operators.Similarity

/** One-off physical-plan metrics probe: runs an operator and prints every
  * executed-plan node with its non-zero metrics (spill, shuffle bytes, rows),
  * so "where does the spill live" is answered by measurement instead of
  * guesswork. Not part of the benchmark protocol — a diagnosis tool.
  *
  * Env: PROBE_N (corpus size, default 500000), PROBE_OP (knn_join),
  * CORPUS_DIR staging as in [[CorpusBench]].
  */
object PlanProbe {

  private def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
    val interesting = p.metrics.filter { case (_, m) => m.value > 0 }
    val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
    out.append("  " * depth).append(p.nodeName)
    if (ms.nonEmpty) out.append("  [").append(ms).append("]")
    out.append('\n')
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1, out)
      case q: QueryStageExec => walk(q.plan, depth + 1, out)
      case _ => p.children.foreach(walk(_, depth + 1, out))
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_N", "500000").toLong
    val stageDir = sys.env.getOrElse("CORPUS_DIR", "/tmp/graft_corpus")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-planprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embPath = s"$stageDir/emb_$n"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(embPath)))
      CorpusBench.embCorpus(spark, n).write.mode("overwrite").parquet(embPath)
    val embs = spark.read.parquet(embPath)

    val planes = Similarity.planesFor(n)
    def run(tag: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      // execute through df's own QueryExecution so node metrics populate
      val rows = df.queryExecution.toRdd.map(_ => 1L).treeReduce(_ + _)
      val sec = (System.nanoTime() - t0) / 1e9
      val sb = new StringBuilder
      walk(df.queryExecution.executedPlan, 0, sb)
      println(f"=== $tag rows=$rows sec=$sec%.2f ===")
      println(sb.toString)
    }
    run("knn_join", Similarity.knnJoin(embs, "vec_id", "embedding", k = 5,
      planes = planes, tables = 4))
    spark.stop()
  }
}

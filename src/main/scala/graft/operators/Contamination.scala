package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard leakage check
  * before a training run (n-gram overlap à la GPT-3 appendix C / PaLM).
  *
  * Shape at 100 TB: both sides reduce to (doc, shingle-hash) streams via the
  * native [[HashExpressions.ShingleHashes]] pass (distinct 64-bit hashes, no
  * shingle strings in the plan), then one equi-join on the hash. The eval
  * side is a benchmark — thousands of documents, not billions — so AQE
  * broadcasts it when it fits and shuffle-joins otherwise; no explicit
  * broadcast hint for the same reason TF-IDF carries none (an unbounded
  * broadcast is a driver OOM at corpus scale). The train side never
  * shuffles its text: only (id, hash) pairs move.
  */
object Contamination {

  /** Training docs sharing at least `minShared` distinct `shingleLen`-gram
    * shingles with any eval doc. Output per flagged training doc:
    * `(train_id, n_shared, n_eval_docs)` — distinct overlapping shingles and
    * distinct eval documents hit. */
  def overlap(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval0: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      shingleLen: Int = 3,
      minShared: Int = 1
  ): DataFrame = {
    def stream(df: DataFrame, idCol: String, textCol: String, idAs: String) =
      Stage.ensureWide(df.select(col(idCol).as(idAs),
          split(trim(lower(col(textCol))), "\\s+").as("tk")))
        .select(col(idAs),
          explode_outer(HashExpressions.shingle_hashes(col("tk"), shingleLen)).as("sh_h"))
        .filter(col("sh_h").isNotNull)

    val t = stream(train, trainIdCol, trainTextCol, "train_id")
    val e = stream(eval0, evalIdCol, evalTextCol, "eval_id")
    t.join(e, "sh_h")
      .groupBy(col("train_id"))
      .agg(countDistinct(col("sh_h")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .filter(col("n_shared") >= minShared)
  }
}

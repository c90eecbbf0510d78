package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeExpressions

/** Byte-pair-encoding tokenizer: corpus-scale training, codegen-friendly
  * encoding — the real subword tokenizer a training-data pipeline runs ahead
  * of token counting, context-window packing, and cost estimation (the
  * regex-based `TextOps.subwordCount` is the cheap approximation; this is
  * the learned one, per Sennrich et al. 2016).
  *
  * Scale split:
  *  - The ONLY corpus-size-dependent work is a word-frequency count — one
  *    hash-aggregate shuffle — followed by a `TakeOrderedAndProject` top-K
  *    of word TYPES. 100 TB of text has billions of tokens but the top-K
  *    word-type dictionary is small and Zipf-dominated: training on the
  *    top 50k types with frequencies captures essentially all pair mass.
  *  - The merge loop itself runs on the driver over that K-entry dict —
  *    cost independent of corpus size (standard practice: fastBPE /
  *    HuggingFace trainers all reduce to a word-freq dict first).
  *  - Encoding is a per-row [[graft.functions.BpeExpressions.BpeEncode]]
  *    expression carrying the learned merge ranks — scan-local, no shuffle,
  *    no UDF: the projection stays inside whole-stage codegen via the
  *    addReferenceObj pattern.
  */
object Bpe {

  /** Learned tokenizer: ranked merges (earlier = higher priority). */
  final case class Model(merges: Seq[(String, String)]) {
    /** rank lookup "a b" -> rank */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** End-of-word marker, appended to each word's last symbol so merges
    * distinguish word-final units ("est</w>" vs "est") — Sennrich's scheme. */
  val EndOfWord = "</w>"

  private def symbols(word: String): Vector[String] = {
    val cs = word.toCharArray.map(_.toString).toVector
    if (cs.isEmpty) cs else cs.init :+ (cs.last + EndOfWord)
  }

  /** Train `numMerges` merges from a (word, freq) dictionary. Deterministic:
    * ties on pair frequency break on the lexicographically smaller pair. */
  def trainFromDict(dict: Seq[(String, Long)], numMerges: Int): Model = {
    var words: Vector[(Vector[String], Long)] =
      dict.iterator.filter(_._1.nonEmpty).map { case (w, f) => (symbols(w), f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, bestN) = counts.foldLeft(((("", "")), -1L)) {
          case (acc @ (bk, bn), (k, n)) =>
            if (n > bn || (n == bn && pairLt(k, bk))) (k, n) else acc
        }
        if (bestN < 2) done = true // a pair seen once cannot generalize
        else {
          merges += best
          val joined = best._1 + best._2
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                  out += joined; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), f)
            }
          }
          m += 1
        }
      }
    }
    Model(merges.result())
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Train on a corpus column: one word-count shuffle, top-`maxWordTypes`
    * types (ties broken on the word for determinism), driver-side merge
    * loop. */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int = 200,
      maxWordTypes: Int = 50000
  ): Model = {
    val words = Stage.ensureWide(df.select(col(textCol).as("text")))
      .select(explode_outer(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxWordTypes)
    val dict = words.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromDict(dict, numMerges)
  }

  /** Subword tokens of `text` under `model` (array<string>, `</w>`-marked). */
  def encode(model: Model, text: Column): Column =
    BpeExpressions.bpe_encode(split(trim(lower(text)), "\\s+"), model.merges)
}

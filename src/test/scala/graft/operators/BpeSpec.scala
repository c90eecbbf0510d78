package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer/encoder: the merge sequence is pinned on the classic
  * hand-computable corpus (Sennrich et al. 2016 §3 example adapted to the
  * end-of-word-marker scheme), plus corpus-level determinism and the
  * dataframe encode path. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge sequence on the hand-computable dictionary") {
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val model = Bpe.trainFromDict(dict, numMerges = 6)
    // pair mass: (e,s)=9 ties (s,t</w>)=9 → lexicographic smaller merges
    // first; then (es,t</w>)=9; (l,o)=7; then the 6-mass tie
    // {(n,e),(e,w),(w,est</w>)} resolves lex to (e,w), after which
    // (ew,est</w>) beats (n,ew) lex at 6, then (n,ewest</w>)=6:
    assert(model.merges.take(6) == Seq(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w"),
      ("ew", "est</w>"), ("n", "ewest</w>")))
  }

  test("encoding applies merges by rank; unseen words fall back to chars") {
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val model = Bpe.trainFromDict(dict, numMerges = 10)
    val df = Seq((1L, "low lowest newest"), (2L, ""), (3L, "zzz")).toDF("id", "text")
    val got = df.select($"id", Bpe.encode(model, $"text").as("tk"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).startsWith(Seq("low</w>", "lo", "w")), s"got ${got(1L)}")
    assert(got(1L).contains("est</w>"))
    assert(got(2L) == Seq.empty[String])
    assert(got(3L) == Seq("z", "z", "z</w>")) // no learned merges apply
  }

  test("training is deterministic and the query runs end-to-end") {
    val docs = sf("sf0.001", "documents")
    val m1 = Bpe.train(docs, "text", numMerges = 50, maxWordTypes = 1000)
    val m2 = Bpe.train(docs, "text", numMerges = 50, maxWordTypes = 1000)
    assert(m1.merges == m2.merges)
    assert(m1.merges.size == 50)
    val counts = docs.select(size(Bpe.encode(m1, col("text"))).as("n"))
      .agg(min($"n"), max($"n")).head()
    assert(counts.getInt(0) > 0)
  }
}

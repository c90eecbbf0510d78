package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SubstringIndexSpec extends SparkSpec {
  import spark.implicits._

  /** All (doc_id, pos) occurrences by brute force — the oracle. */
  private def brute(docs: Seq[(Long, String)], pat: String): Set[(Long, Long)] =
    docs.flatMap { case (id, s) =>
      Iterator.iterate(s.indexOf(pat))(i => s.indexOf(pat, i + 1))
        .takeWhile(_ >= 0).map(i => (id, (i + 1).toLong)).toSeq
    }.toSet

  private def allHits(df: DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "quick brown foxes are quick brown and quick"),
    (3L, "aaaaaa"), // overlapping occurrences
    (4L, "xy"), // shorter than any pattern
    (5L, "abcabcabc"), // pattern with repeated trigrams
    (6L, "unrelated content entirely")
  )

  private def freshIndex(d: Seq[(Long, String)]): String = {
    val path = Files.createTempDirectory("triidx_spec").toString
    SubstringIndex.buildIndex(d.toDF("doc_id", "text"), "doc_id", "text", path)
    path
  }

  test("searchAll matches brute force, including overlapping and repeated-trigram patterns") {
    val idx = freshIndex(docs)
    for (pat <- Seq("quick brown", "aaa", "abcabc", "the", "fox", "zzz-not-there")) {
      assert(allHits(SubstringIndex.searchAll(spark, idx, pat)) == brute(docs, pat),
        s"pattern '$pat'")
    }
  }

  test("search returns strpos semantics: first occurrence per matching doc") {
    val idx = freshIndex(docs)
    val got = allHits(SubstringIndex.search(spark, idx, "quick"))
    val want = brute(docs, "quick").groupBy(_._1)
      .map { case (id, hits) => (id, hits.map(_._2).min) }.toSet
    assert(got == want && want.nonEmpty)
  }

  test("append maintenance: new batch is searchable alongside the old, old batches untouched") {
    val idx = freshIndex(docs)
    val newDocs = Seq((7L, "a freshly ingested quick note"), (8L, "nothing here"))
    val b = SubstringIndex.appendIndex(newDocs.toDF("doc_id", "text"), "doc_id", "text", idx)
    assert(b == 1)
    val got = allHits(SubstringIndex.search(spark, idx, "quick"))
    assert(got.map(_._1).contains(7L) && got.map(_._1).contains(1L))
    assert(allHits(SubstringIndex.searchAll(spark, idx, "quick")) ==
      brute(docs ++ newDocs, "quick"))
    // a second append lands as batch 2
    assert(SubstringIndex.appendIndex(
      Seq((9L, "more text")).toDF("doc_id", "text"), "doc_id", "text", idx) == 2)
  }

  test("planFiles prunes: a narrow pattern reads fewer files than the index holds") {
    // many docs over a wide alphabet so the range clustering yields files
    // with genuinely disjoint trigram ranges; force several files per batch
    val wide = (0 until 2000).map { i =>
      val c = ('a' + i % 26).toChar
      (i.toLong, s"$c$c$c-doc-$i-" + ("uvwxyz".permutations.drop(i % 100).next()))
    }
    val path = Files.createTempDirectory("triidx_prune").toString
    val p = SubstringIndex.postings(wide.toDF("doc_id", "text"), "doc_id", "text")
      .repartitionByRange(8, col("tri"), col("doc_id"))
    SubstringIndex.indexFormat.writeBatch(p, path, 0,
      graft.model.CodecSpec("zstd", 1), "PARQUET", Nil, Seq("tri", "doc_id", "pos"))
    val (kept, total) = SubstringIndex.planFiles(spark, path, "zzz")
    assert(total >= 8, s"expected >= 8 files, got $total")
    assert(kept.size < total, s"kept ${kept.size} of $total — no pruning")
    // pruned search is still exact
    assert(allHits(SubstringIndex.searchAll(spark, path, "zzz")) == brute(wide, "zzz"))
  }

  test("index-only search agrees with the q109 documents-table answer at sf0.001") {
    val d = sf("sf0.001", "documents")
    val pat = "slow fast"
    val idx = Files.createTempDirectory("triidx_docs").toString
    SubstringIndex.buildIndex(d, "doc_id", "text", idx)
    val got = allHits(SubstringIndex.search(spark, idx, pat))
    val want = d.filter(instr(col("text"), pat) > 0)
      .select(col("doc_id"), instr(col("text"), pat).cast("long").as("pos"))
      .as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }
}

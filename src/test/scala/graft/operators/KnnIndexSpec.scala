package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_knnidx").toString

  private lazy val emb = sf("sf0.001", "embeddings").cache()

  test("build + append + delta join: exact parity with a full knnJoinIvf " +
      "rebuild when the shortlist covers whole cells") {
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    val path = tmpDir()
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8)
    KnnIndex.append(neu, "vec_id", "embedding", path)
    // kCand ≥ any cell's occupancy ⇒ the trained-PQ shortlist cannot cut,
    // so both pipelines exact-rescore every probed-cell member: the stored
    // multi-batch directories must reproduce the one-shot rebuild's rows
    // EXACTLY (same cells — the assign rule is a pure function — same
    // probes, same rounded cosines, same ranks), restricted to the delta
    // anchors. This is the parity that makes "append instead of rebuild"
    // a storage decision, not a semantics change.
    val inc = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path, k = 3,
        nprobe = 4, kCand = 100000)
      .as[(Long, Long, Double, Int)].collect().toSet
    val full = Similarity.knnJoinIvf(emb, "vec_id", "embedding", k = 3,
        nLists = 8, nprobe = 4, kCand = 100000)
      .filter($"id_a" % 5 === 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(inc == full, s"delta join diverged from the rebuild: " +
      s"only-inc=${(inc -- full).take(5)} only-full=${(full -- inc).take(5)}")
  }

  test("planted duplicates arriving as a delta find their stored originals at rank 1") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    val dup = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    KnnIndex.append(dup, "vec_id", "embedding", path)
    val nn = KnnIndex.knnJoinDelta(dup, "vec_id", "embedding", path, k = 3,
        nprobe = 4)
      .as[(Long, Long, Double, Int)].collect()
    (0 until 3).foreach { i =>
      val top = nn.filter(p => p._1 == i + 10000 && p._4 == 1)
      assert(top.nonEmpty && top.head._2 == i && top.head._3 > 0.999,
        s"delta copy ${i + 10000}'s rank-1 neighbor should be stored $i, got ${top.toSeq}")
    }
    // only delta anchors answered; ranks are 1..k per anchor
    assert(nn.forall(_._1 >= 10000))
    nn.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
  }

  test("append writes new files only — the base generation's files are untouched") {
    val path = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    def files(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(s"$path/members")
      val out = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(root).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          out(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis
      }
      out.toMap
    }
    val before = files()
    KnnIndex.append(emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding", path)
    val after = files()
    assert(before.nonEmpty && after.size > before.size,
      s"append added no files (${before.size} -> ${after.size})")
    before.foreach { case (f, ts) =>
      assert(after.get(f).contains(ts), s"append rewrote base file $f")
    }
  }

  test("meta round-trips: stored codebook equals the trained one") {
    val path = tmpDir()
    val written = KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    val read = KnnIndex.readMeta(spark, path)
    assert(read.nLists == written.nLists && read.dims == written.dims &&
      read.m == written.m && read.ks == written.ks && read.subDim == written.subDim)
    assert(read.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      written.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }
}

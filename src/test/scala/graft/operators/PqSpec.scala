package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("sf0.001", "embeddings").cache()
  private val Dim = 64

  test("training is deterministic; codes are within range and cover sub-spaces") {
    val cb1 = Pq.train(emb, "embedding", Dim, m = 8, k = 16, iters = 2)
    val cb2 = Pq.train(emb, "embedding", Dim, m = 8, k = 16, iters = 2)
    assert(cb1.codebooks.map(_.centroids.map(_.toSeq).toSeq).toSeq ==
      cb2.codebooks.map(_.centroids.map(_.toSeq).toSeq).toSeq)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb1)
      .as[(Long, Seq[Int])].collect()
    assert(codes.length == emb.count())
    codes.foreach { case (_, c) =>
      assert(c.length == 8 && c.forall(x => x >= 0 && x < 16))
    }
    // codes must discriminate: not every vector maps to one code word
    assert(codes.map(_._2).distinct.length > 10)
  }

  test("ADC distance matches a driver-side reconstruction exactly") {
    val cb = Pq.train(emb, "embedding", Dim, m = 8, k = 16, iters = 2)
    val q = emb.filter($"vec_id" === 7).head().getSeq[Float](1)
    val tables = cb.adcTables(q.iterator.map(_.toDouble).toArray)
    val got = Pq.topK(Pq.encode(emb, "vec_id", "embedding", cb), cb, q, 5)
      .as[(Long, Double)].collect().toMap
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    got.foreach { case (id, d) =>
      val manual = codes(id).zipWithIndex.map { case (c, s) => tables(s)(c) }.sum
      assert(math.abs(d - BigDecimal(manual).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"id $id: $d vs $manual")
    }
  }

  test("a planted duplicate of the query lands in the ADC top-k") {
    val q = emb.filter($"vec_id" === 0).head().getSeq[Float](1)
    val dup = emb.filter($"vec_id" === 0)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val all = emb.unionByName(dup)
    val cb = Pq.train(all, "embedding", Dim, m = 8, k = 16, iters = 2)
    val top = Pq.topK(Pq.encode(all, "vec_id", "embedding", cb), cb, q, 10)
      .as[(Long, Double)].collect()
    val ids = top.map(_._1).toSet
    assert(ids.contains(0L) && ids.contains(10000L),
      s"query and its planted copy must share the minimal ADC distance, got ${top.toSeq}")
    // both copies score identically (identical codes)
    assert(top.find(_._1 == 0L).map(_._2) == top.find(_._1 == 10000L).map(_._2))
  }

  test("IVF+PQ: cluster-pruned ADC search finds the planted duplicate") {
    val q = emb.filter($"vec_id" === 0).head().getSeq[Float](1)
    val dup = emb.filter($"vec_id" === 0)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val all = emb.unionByName(dup)
    val ivf = Ivf.train(all, "embedding", k = 8, iters = 2)
    val pq = Pq.train(all, "embedding", Dim, m = 8, k = 16, iters = 2)
    val index = Pq.ivfPqIndex(all, "vec_id", "embedding", ivf, pq).cache()
    // index carries the composed layout
    assert(index.columns.toSeq == Seq("id", "cluster", "code"))
    val top = Pq.ivfPqTopK(index, ivf, pq, q, 10, nprobe = 3)
      .as[(Long, Double)].collect()
    val ids = top.map(_._1).toSet
    // query and its exact copy share a cluster and identical codes
    assert(ids.contains(0L) && ids.contains(10000L), s"got ${top.toSeq}")
    // pruning really prunes: fewer candidate rows than the corpus
    val probed = ivf.nearest(q.iterator.map(_.toDouble).toArray, 3)
    val candidates = index.filter($"cluster".isin(probed: _*)).count()
    assert(candidates < all.count(), "nprobe=3/8 must scan a strict subset")
  }

  test("PQ recall vs exact L2 top-k is usable at 32x compression") {
    val cb = Pq.train(emb, "embedding", Dim, m = 8, k = 16, iters = 3)
    val q = emb.filter($"vec_id" === 0).head().getSeq[Float](1)
    val qArr = q.toArray
    // exact squared-L2 top-10 on the driver (500 vectors)
    val exact = emb.as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, _) =>
        id -> v.zip(qArr).map { case (a, b) => val d = a.toDouble - b; d * d }.sum
      }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val approx = Pq.topK(Pq.encode(emb, "vec_id", "embedding", cb), cb, q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (exact & approx).size / 10.0
    info(s"PQ recall@10 = $recall (m=8, k=16 on 64-dim uniform vectors)")
    assert(approx.contains(0L), "query vector itself must be found")
    assert(recall >= 0.3, s"recall $recall too low even for uniform data")
  }

  test("IVF+PQ index at rest: cluster partitions prune, stored ≡ in-memory top-k") {
    import org.apache.spark.sql.functions._
    val ivf = Ivf.train(emb, "embedding", k = 8, iters = 2)
    val pq = Pq.train(emb, "embedding", dim = 64, m = 8, k = 16, iters = 2)
    val index = Pq.ivfPqIndex(emb, "vec_id", "embedding", ivf, pq)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    index.write.partitionBy("cluster").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = emb.filter($"vec_id" === 0).head().getSeq[Float](1)
    val probes = ivf.nearest(q.map(_.toDouble).toArray, 3)
    val probed = stored.filter($"cluster".isin(probes.map(Integer.valueOf): _*))
    assert(probed.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val filesRead = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(filesRead.nonEmpty &&
      filesRead.forall(f => probes.exists(p => f.contains(s"cluster=$p"))))
    val viaStored = Pq.ivfPqTopK(stored, ivf, pq, q, 10, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    val viaMem = Pq.ivfPqTopK(index, ivf, pq, q, 10, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    assert(viaStored == viaMem)
  }
}

package graft.operators

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("sf0.001", "embeddings").cache()

  test("training is deterministic and assignments cover the corpus") {
    val cb1 = Ivf.train(emb, "embedding", k = 8, iters = 3)
    val cb2 = Ivf.train(emb, "embedding", k = 8, iters = 3)
    assert(cb1.centroids.map(_.toSeq).toSeq == cb2.centroids.map(_.toSeq).toSeq)
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", cb1).cache()
    assert(index.count() == emb.count())
    val clusters = index.groupBy("cluster").count().collect()
    assert(clusters.length > 1, "degenerate clustering")
    // every vector in exactly one cluster
    assert(index.select("id").distinct().count() == emb.count())
  }

  test("assign is a columnar native expression — no RDD conversion in the plan") {
    val cb = Ivf.train(emb, "embedding", k = 8, iters = 1)
    val assigned = Ivf.assign(emb.select($"vec_id", $"embedding"), "embedding", cb)
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("ExistingRDD") && !p.contains("Scan ExistingRDD"),
      s"assign dropped to an RDD scan:\n$p")
    assert(p.contains("nearestcentroid"), s"native expression missing from plan:\n$p")
    // parity with the driver-side argmin used for probe selection
    val rows = assigned.select($"v", $"cluster").as[(Seq[Float], Int)].collect()
    rows.take(50).foreach { case (v, c) =>
      assert(cb.nearest(v.iterator.map(_.toDouble).toArray, 1).head == c)
    }
  }

  test("IVF top-k recall vs brute force beats the probe fraction") {
    val cb = Ivf.train(emb, "embedding", k = 8, iters = 3)
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", cb).cache()
    val q = emb.filter($"vec_id" === 0).head().getSeq[Float](1)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Ivf.topK(index, cb, q, 10, nprobe = 3)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (exact & approx).size / 10.0
    info(s"IVF recall@10 = $recall at nprobe=3/8 (scan fraction ~3/8)")
    assert(approx.contains(0L), "query vector itself must be found")
    assert(recall >= 0.5, s"recall $recall below 0.5")
  }

  test("IVF index at rest: cluster is the partition key, probes prune partitions") {
    import org.apache.spark.sql.functions._
    val cb = Ivf.train(emb, "embedding", k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    // the at-rest layout the Scaladoc promises: one partition per cluster
    Ivf.buildIndex(emb, "vec_id", "embedding", cb)
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = emb.filter($"vec_id" === 0).head().getSeq[Float](1)
    val probes = cb.nearest(q.map(_.toDouble).toArray, 3)
    val probed = stored.filter($"cluster".isin(probes.map(Integer.valueOf): _*))
    // partition pruning is visible in the plan …
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"no partition filter pushed:\n$plan")
    // … and on disk: only the probed cluster directories are read
    val filesRead = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(filesRead.nonEmpty &&
      filesRead.forall(f => probes.exists(p => f.contains(s"cluster=$p"))),
      s"read beyond probed clusters: ${filesRead.filterNot(f => probes.exists(p => f.contains(s"cluster=$p"))).take(3)}")
    // the same query through the stored index returns the same top-k as the
    // in-memory index — the layout changes cost, not results
    val viaStored = Ivf.topK(stored, cb, q, 10, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    val viaMem = Ivf.topK(Ivf.buildIndex(emb, "vec_id", "embedding", cb), cb, q, 10,
      nprobe = 3).as[(Long, Double)].collect().toSeq
    assert(viaStored == viaMem)
  }
}

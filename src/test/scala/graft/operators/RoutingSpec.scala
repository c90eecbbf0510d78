package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The knnJoinAuto dispatch boundary and the structural stats check it
  * rides on — asserted per regime so a mis-set default is a failing spec,
  * not a silent 54 GB-spill LSH run (or a fabricated-estimate exchange). */
class RoutingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("sf0.001", "embeddings").cache()

  test("statsKnown: file-backed projections yes; statless plans no, even when " +
      "width-ratio arithmetic fabricates a below-sentinel estimate") {
    assert(Stage.statsKnown(emb.select($"vec_id", $"embedding")))
    // a LogicalRDD with NO propagated stats (localCheckpoint is the
    // benign case in Spark 4 — it copies the parent plan's statistics
    // into the leaf, so it stays "known"; a raw RDD-backed frame is the
    // genuinely statless one)
    val statless = spark.createDataFrame(emb.rdd, emb.schema)
    assert(!Stage.statsKnown(statless))
    assert(Stage.statsKnown(emb.localCheckpoint()),
      "localCheckpoint carries propagated stats in Spark 4 — structural " +
        "check must honor them, not blanket-distrust LogicalRDD")
    // the trap the estimate-vs-sentinel idiom fell into: a narrowing
    // Project over a statless leaf scales Long.MaxValue DOWN by the
    // width ratio, so its own stats read as "known" while the leaf is not
    val narrowed = statless.select(col("vec_id"))
    val sentinel = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    info(s"narrowed statless estimate = " +
      s"${narrowed.queryExecution.analyzed.stats.sizeInBytes} (sentinel $sentinel)")
    assert(!Stage.statsKnown(narrowed),
      "projection arithmetic must not launder a statless leaf into known stats")
  }

  test("knnJoinAuto routes: small file-backed → lsh; above lshMaxBytes → ivf; " +
      "statless → ivf (never gamble on a driver broadcast collect)") {
    assert(Similarity.knnJoinAutoRoute(emb, "vec_id", "embedding") == "lsh")
    assert(Similarity.knnJoinAutoRoute(emb, "vec_id", "embedding",
      lshMaxBytes = 1L) == "ivf")
    assert(Similarity.knnJoinAutoRoute(
      spark.createDataFrame(emb.rdd, emb.schema), "vec_id",
      "embedding") == "ivf")
  }

  test("knnJoinAuto derives dims from the data — a 16-dim corpus routed to IVF " +
      "assigns cells on all 16 components, not a fabricated 64") {
    // 16-dim slices of the fixture vectors, forced onto the IVF path
    val short = emb.select($"vec_id", slice($"embedding", 1, 16).as("embedding"))
    val auto = Similarity.knnJoinAuto(short, "vec_id", "embedding", k = 3,
        lshMaxBytes = 1L)
      .as[(Long, Long, Double, Int)].collect().toSet
    val direct = Similarity.knnJoinIvf(short, "vec_id", "embedding", k = 3,
        dims = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(auto == direct, "auto route with derived dims must equal an " +
      "explicit dims=16 IVF join")
    assert(auto.nonEmpty)
  }

  test("portable incremental twin: equals the full portable join restricted " +
      "to the delta anchors (the probe filter IS the semantics)") {
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    val inc = Similarity.knnJoinIvfPqPortableIncremental(old, neu,
        "vec_id", "embedding", k = 3, nLists = 8, nprobe = 2, kCand = 20)
      .as[(Long, Long, Double, Long)].collect().toSet
    val full = Similarity.knnJoinIvfPqPortable(emb, "vec_id", "embedding",
        k = 3, nLists = 8, nprobe = 2, kCand = 20)
      .filter($"id_a" % 5 === 0)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(inc == full)
    assert(inc.nonEmpty && inc.forall(_._1 % 5 == 0))
  }

  test("dims derivation at every entry point: a 128-d corpus with DEFAULTED " +
      "dims gets correct cell assignment (knnJoinIvf + hardNegativesAnnCell), " +
      "and an explicit mismatch raises the typed error, not degraded recall") {
    // 128-d corpus: each fixture vector concatenated with its reverse —
    // the upper half carries signal a fabricated dims=64 would TRUNCATE
    val wide = emb.select($"vec_id",
      concat($"embedding", reverse($"embedding")).as("embedding"))
    val derived = Similarity.knnJoinIvf(wide, "vec_id", "embedding", k = 3,
        nLists = 8, nprobe = 4, kCand = 100000)
      .as[(Long, Long, Double, Int)].collect().toSet
    val explicit = Similarity.knnJoinIvf(wide, "vec_id", "embedding", k = 3,
        nLists = 8, nprobe = 4, kCand = 100000, dims = 128)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(derived == explicit && derived.nonEmpty,
      "defaulted dims must assign on all 128 components")
    val withLbl = wide.withColumn("lbl", pmod($"vec_id", lit(4L)))
    val minedDerived = Similarity.hardNegativesAnnCell(withLbl, "vec_id",
        "embedding", "lbl", k = 2, nLists = 8, nprobe = 4, kCand = 100000)
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
    val minedExplicit = Similarity.hardNegativesAnnCell(withLbl, "vec_id",
        "embedding", "lbl", k = 2, nLists = 8, nprobe = 4, kCand = 100000,
        dims = 128)
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSet
    assert(minedDerived == minedExplicit && minedDerived.nonEmpty)
    // explicit dims that disagrees with the data raises — typed, at once
    val ex = intercept[DimsMismatchException] {
      Similarity.knnJoinIvf(wide, "vec_id", "embedding", k = 3, dims = 64)
        .collect()
    }
    assert(ex.explicitDims == 64 && ex.sampledDims == 128)
    intercept[DimsMismatchException] {
      Similarity.knnJoinIvfPqPortable(wide, "vec_id", "embedding", k = 3,
        dims = 64).collect()
    }
    intercept[DimsMismatchException] {
      val p = java.nio.file.Files.createTempDirectory("graft_dims").toString
      KnnIndex.build(wide, "vec_id", "embedding", p, nLists = 8, dims = 64)
    }
  }

  test("maxExchangeParts is conf-tied: a sized exchange's derived partition " +
      "count caps at spark.graft.maxExchangeParts, not a baked-in literal") {
    assert(Stage.maxExchangeParts(emb) == 65536L)
    spark.conf.set("spark.graft.maxExchangeParts", "128")
    try {
      assert(Stage.maxExchangeParts(emb) == 128L)
      // a priced volume far past the cap: hashNearDups' band exchange
      // wants n·bands·96B/16MB parts ≈ 190k at the hinted n — the plan
      // must carry the conf cap instead
      val hashes = emb.select($"vec_id".as("id"), xxhash64($"embedding").as("hash"))
      val got = graft.multimodal.Multimodal.hashNearDups(hashes,
        maxHamming = 3, bands = 4, nRows = 8L * 1000 * 1000 * 1000)
      val parts = got.queryExecution.logical.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
          r.optNumPartitions
      }.flatten
      assert(parts.contains(128),
        s"band exchange must size at the conf cap 128, got $parts")
    } finally spark.conf.unset("spark.graft.maxExchangeParts")
  }

  test("deltaProbeRoute matches the executed probe attach, both regimes") {
    val path = java.nio.file.Files.createTempDirectory("graft_route").toString
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    val tiny = emb.filter($"vec_id" < 50)
    // tiny delta: the route says broadcast, and the executed plan IS a
    // broadcast join (the stored members cross no exchange)
    assert(KnnIndex.deltaProbeRoute(spark, path, 50) == "broadcast_probes")
    val plan = KnnIndex.knnJoinDelta(tiny, "vec_id", "embedding", path, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tiny delta must broadcast probes, plan was:\n$plan")
    val planMine = KnnIndex.hardNegativesDelta(tiny, "vec_id", "embedding",
        "label", path, k = 3)
      .queryExecution.executedPlan.toString
    assert(planMine.contains("BroadcastHashJoin"),
      s"tiny mining delta must broadcast probes, plan was:\n$planMine")
    // a delta big enough to blow the gate routes shuffled — the same
    // arithmetic the operator gates on, so the bench tag cannot drift
    assert(KnnIndex.deltaProbeRoute(spark, path, 500L * 1000 * 1000) ==
      "shuffled_probes")
  }
}

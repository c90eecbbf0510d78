package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExpressions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = sf("sf0.001", "embeddings").cache()

  test("native dot/l2norm match the higher-order-function formulation exactly") {
    val hofDot = aggregate(
      zip_with($"embedding".cast("array<double>"), $"q".cast("array<double>"),
        (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)
    val q = vecs.limit(1).select($"embedding").head().getSeq[Float](0)
    val df = vecs.withColumn("q", array(q.map(lit(_)): _*))
    val rows = df.select(
      dot_product($"embedding", $"q").as("native"),
      hofDot.as("hof"),
      l2_norm($"embedding").as("nnorm"),
      sqrt(aggregate(zip_with($"embedding".cast("array<double>"),
        $"embedding".cast("array<double>"), (x, y) => x * y), lit(0.0d),
        (acc, v) => acc + v)).as("hnorm")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "norm mismatch")
    }
  }

  test("null and empty inputs") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(dot_product($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("mismatched types are rejected at analysis") {
    val df = Seq((Seq(1.0f), Seq(1.0))).toDF("a", "b")
    intercept[Exception](df.select(dot_product($"a", $"b")).collect())
  }

  test("expressions run inside whole-stage codegen") {
    val df = vecs.select(dot_product($"embedding", $"embedding").as("d"))
    // whole-stage-codegen stages print as `*(n)` prefixes in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
    assert(df.agg(sum($"d")).head().getDouble(0) > 0)
  }

  test("portable IVF assignment matches the driver mirror on real embeddings") {
    val rows = vecs.select($"vec_id", $"embedding",
      portable_ivf_assign($"embedding", 8, 64).as("c")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      assert(r.getInt(2) == VectorExpressions.portableIvfAssignLocal(v, 8),
        s"assignment mismatch for vec ${r.getLong(0)}")
    }
    // every list index is reachable under the sign family (sanity that the
    // md5 parity rule isn't degenerate on this data)
    assert(rows.map(_.getInt(2)).distinct.length > 1)
  }

  test("hierarchical portable IVF assignment (nLists > 64) matches the mirror") {
    // nLists = 128 crosses the two-level threshold: B = 12, S = 11
    assert(VectorExpressions.blockSize(128) == 12)
    assert(VectorExpressions.superCells(128) == 11)
    val rows = vecs.select($"vec_id", $"embedding",
      portable_ivf_assign($"embedding", 128, 64).as("c")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val c = r.getInt(2)
      assert(c == VectorExpressions.portableIvfAssignLocal(v, 128),
        s"hier assignment mismatch for vec ${r.getLong(0)}")
      // the assigned cell really is the best of ITS block (the two-level
      // contract: flat-best within the selected super's contiguous block)
      val xq = v.map(x => (if (x >= 0) math.floor(x * 1e6 + 0.5)
                           else math.ceil(x * 1e6 - 0.5)).toLong)
      def dot(cc: Int) = xq.indices.map(j =>
        VectorExpressions.md5SignIvf(cc, j + 1).toLong * xq(j)).sum
      val blockStart = (c / 12) * 12
      val block = blockStart until math.min(128, blockStart + 12)
      assert(block.map(cc => (dot(cc), cc)).maxBy(t => (t._1, -t._2))._2 == c)
    }
    assert(rows.map(_.getInt(2)).distinct.length > 1)
  }

  test("portable IVF probe: head equals the assignment, cells are distinct/ranked") {
    for (lists <- Seq(8, 128)) {
      val rows = vecs.select($"embedding",
        portable_ivf_probe($"embedding", lists, 64, 4).as("p"),
        portable_ivf_assign($"embedding", lists, 64).as("c")).collect()
      rows.foreach { r =>
        val p = r.getSeq[Int](1)
        assert(p.length == 4 && p.distinct.length == 4, s"probe list $p")
        assert(p.forall(c => c >= 0 && c < lists))
        // the probe rule mirrors the assignment rule in both regimes, so
        // the head is ALWAYS the assigned cell (flat: global top-1;
        // hierarchical: top super's block-local argmax)
        assert(p.head == r.getInt(2), s"head ${p.head} != assign ${r.getInt(2)} at nLists=$lists")
      }
      val one = vecs.select(
        portable_ivf_probe($"embedding", lists, 64, 1).as("p"),
        portable_ivf_assign($"embedding", lists, 64).as("c")).collect()
      one.foreach(r => assert(r.getSeq[Int](0).head == r.getInt(1),
        s"nprobe=1 probe != assignment at nLists=$lists"))
    }
  }

  test("portable IVF probe: cellsPerSuper widens each probed block, keeps the head") {
    // hierarchical regime (128 lists -> 12-cell blocks): the c=2 list must
    // contain the c=1 list, emit <= 2 cells from each probed super's block,
    // and still lead with the assigned cell; flat regime: knob is inert
    val rows = vecs.select(
      portable_ivf_probe($"embedding", 128, 64, 4).as("p1"),
      portable_ivf_probe($"embedding", 128, 64, 4, cellsPerSuper = 2).as("p2"),
      portable_ivf_assign($"embedding", 128, 64).as("c")).collect()
    rows.foreach { r =>
      val p1 = r.getSeq[Int](0)
      val p2 = r.getSeq[Int](1)
      assert(p2.length == 8 && p2.distinct.length == 8, s"c=2 probe list $p2")
      assert(p1.toSet.subsetOf(p2.toSet), s"c=1 $p1 not within c=2 $p2")
      assert(p2.head == r.getInt(2), s"c=2 head ${p2.head} != assign ${r.getInt(2)}")
      // pairs (2g, 2g+1) of the c=2 list share a block; rank-1 is the c=1 cell
      (0 until 4).foreach { g =>
        assert(p2(2 * g) / 12 == p2(2 * g + 1) / 12, s"pair $g not same block in $p2")
        assert(p2(2 * g) == p1(g), s"block rank-1 ${p2(2 * g)} != c=1 ${p1(g)}")
      }
    }
    val flat = vecs.select(
      portable_ivf_probe($"embedding", 8, 64, 4).as("p1"),
      portable_ivf_probe($"embedding", 8, 64, 4, cellsPerSuper = 2).as("p2")).collect()
    flat.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1),
      "cellsPerSuper must be inert in the flat regime"))
  }

  test("three-level portable IVF (nLists > 65536): mirror parity, probe head, widening") {
    // 100000 lists crosses the three-level threshold: B = 47 (47³ = 103823),
    // M = ceil(100000/47) = 2128 mid-blocks, T = ceil(2128/47) = 46 tops
    val lists = 100000
    assert(VectorExpressions.cbrtBlock(lists) == 47)
    assert(VectorExpressions.midCells(lists) == 2128)
    assert(VectorExpressions.topCells(lists) == 46)
    val rows = vecs.select($"vec_id", $"embedding",
      portable_ivf_assign($"embedding", lists, 64).as("c"),
      portable_ivf_probe($"embedding", lists, 64, 4).as("p"),
      portable_ivf_probe($"embedding", lists, 64, 4, cellsPerSuper = 2).as("p2"))
      .collect()
    assert(rows.nonEmpty)
    // the driver mirror hashes ~9k md5s per vector at this size — parity
    // over a slice is the rule check; the full column pins the native path
    rows.take(40).foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      assert(r.getInt(2) == VectorExpressions.portableIvfAssignLocal(v, lists),
        s"three-level assignment mismatch for vec ${r.getLong(0)}")
    }
    rows.foreach { r =>
      val c = r.getInt(2)
      val p = r.getSeq[Int](3)
      assert(p.head == c, s"probe head ${p.head} != assign $c")
      assert(p.distinct.length == p.length && p.forall(x => x >= 0 && x < lists))
      // each probed cell is its own mid-block's emission; the c=2 widening
      // keeps the c=1 list as the per-block rank-1 prefix
      val p2 = r.getSeq[Int](4)
      assert(p2.head == c && p.toSet.subsetOf(p2.toSet),
        s"c=2 $p2 must contain c=1 $p with same head")
      (0 until p.length).foreach { g =>
        assert(p2(2 * g) / 47 == p2(2 * g + 1) / 47, s"pair $g not same block in $p2")
        assert(p2(2 * g) == p(g), s"block rank-1 ${p2(2 * g)} != c=1 ${p(g)}")
      }
    }
    assert(rows.map(_.getInt(2)).distinct.length > 1)
  }

  test("SQL registration: dot_product / l2_norm callable from SQL") {
    VectorExpressions.register(spark)
    vecs.createOrReplaceTempView("emb")
    val r = spark.sql(
      "SELECT l2_norm(embedding) AS n, dot_product(embedding, embedding) AS d FROM emb LIMIT 5")
      .collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) * row.getDouble(0) - row.getDouble(1)) < 1e-9))
  }
}

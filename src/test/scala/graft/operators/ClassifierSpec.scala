package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable by construction: y = 1 iff f > 0.55, with margin
  private lazy val sep = (1 to 400)
    .map(i => (i.toLong, (i % 100) / 100.0, if ((i % 100) / 100.0 > 0.55) 1.0 else 0.0))
    .toDF("id", "f", "y")

  test("logisticFit learns a separable 1-feature rule (AUC 1.0, loss falls)") {
    val w = Classifier.logisticFit(sep, $"y", Seq($"f"), iters = 50, lr = 5.0)
    assert(w.length == 2)
    assert(w(1) > 0.0, s"positive-slope rule must get a positive weight: ${w.toList}")
    val scored = sep.withColumn("p", Classifier.logisticScore(w, Seq($"f")))
    // separable data → the score must rank every positive above every negative
    val auc = Metrics.rocAuc(scored, $"y", $"p").head().getDouble(0)
    assert(auc == 1.0, s"separable fit must reach AUC 1.0, got $auc")
    // and the fit must beat the zero-weight model's log-loss
    def logLoss(weights: Array[Double]): Double =
      sep.withColumn("p", Classifier.logisticScore(weights, Seq($"f")))
        .agg(avg(-($"y" * log($"p") + (lit(1.0) - $"y") * log(lit(1.0) - $"p"))))
        .head().getDouble(0)
    assert(logLoss(w) < logLoss(Array(0.0, 0.0)))
  }

  test("logisticFit is insensitive to partitioning beyond float-sum jitter") {
    val a = Classifier.logisticFit(sep.repartition(2), $"y", Seq($"f"), iters = 10)
    val b = Classifier.logisticFit(sep.repartition(13), $"y", Seq($"f"), iters = 10)
    a.zip(b).foreach { case (x, yv) =>
      assert(math.abs(x - yv) < 1e-9, s"${a.toList} vs ${b.toList}")
    }
  }

  test("logisticFit leaves nothing cached") {
    // other suites share this session and may hold their own caches —
    // assert no NEW persistent RDDs survive the fit, not an empty registry
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Classifier.logisticFit(sep, $"y", Seq($"f"), iters = 2)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"the fit's feature cache must be released: $leaked")
  }

  test("rocAuc: hand-computed midrank example with ties") {
    // scores (1,1,2,3), labels (0,1,0,1): pairs = tie(0.5) + 0 + 1 + 1 → 2.5/4
    val df = Seq((0L, 1.0), (1L, 1.0), (0L, 2.0), (1L, 3.0)).toDF("y", "s")
    val r = Metrics.rocAuc(df, $"y", $"s").head()
    assert(r.getDouble(0) == 0.625)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  test("rocAuc: perfect, inverted, and constant scores") {
    val df = (1 to 100).map(i => (if (i > 50) 1L else 0L, i.toDouble)).toDF("y", "s")
    assert(Metrics.rocAuc(df, $"y", $"s").head().getDouble(0) == 1.0)
    assert(Metrics.rocAuc(df, $"y", -$"s").head().getDouble(0) == 0.0)
    // constant score: every pair is a tie → exactly 0.5
    assert(Metrics.rocAuc(df, $"y", lit(7.0)).head().getDouble(0) == 0.5)
  }

  test("recallAtK: hand-built approx/exact — micro mean, tail min, " +
      "perfect fraction, dropped anchors score zero") {
    def knn(rows: (Long, Long)*) = rows.groupBy(_._1).toSeq
      .flatMap { case (a, ns) => ns.zipWithIndex.map { case ((_, b), i) =>
        (a, b, 1.0 - 0.1 * i, i + 1) } }
      .toDF("id_a", "id_b", "cosine", "rank")
    // exact: anchors 1 (nbrs 10,11), 2 (nbrs 20,21), 3 (nbrs 30,31)
    val exact = knn((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L),
      (3L, 30L), (3L, 31L))
    // approx: anchor 1 perfect, anchor 2 half right, anchor 3 MISSING —
    // and a rank-3 row on anchor 1 that the k=2 cut must ignore
    val approx = knn((1L, 10L), (1L, 11L), (1L, 99L), (2L, 20L), (2L, 99L))
    val r = Metrics.recallAtK(approx, exact, k = 2).head()
    assert(r.getLong(0) == 3L, s"anchors: $r")
    assert(r.getDouble(1) == 0.5, s"micro recall (3 of 6 hits): $r")
    assert(r.getDouble(2) == 0.0, s"min recall (dropped anchor 3): $r")
    assert(math.abs(r.getDouble(3) - 0.333333) < 1e-9, s"perfect frac: $r")
    // self-evaluation is perfect across the board
    val self = Metrics.recallAtK(exact, exact, k = 2).head()
    assert(self.getDouble(1) == 1.0 && self.getDouble(2) == 1.0 &&
      self.getDouble(3) == 1.0)
  }
}

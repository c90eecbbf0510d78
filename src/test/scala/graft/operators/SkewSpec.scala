package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key carrying 90% of rows + a uniform tail — the shape that
  // serializes a plain shuffle onto a single reducer
  private lazy val skewed = (
    (1 to 9000).map(i => ("hot", i.toLong, i * 0.5)) ++
    (1 to 1000).map(i => (s"k${i % 50}", i.toLong, i * 0.25))
  ).toDF("key", "id", "value")

  private lazy val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"seg$i") }.toDF("key", "segment")

  test("saltedSum is exact vs the plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(sum($"value").as("sum_value"), count(lit(1)).as("n_rows"))
      .as[(String, Double, Long)].collect().map { case (k, sm, n) => k -> ((sm, n)) }.toMap
    val salted = Skew.saltedSum(skewed, Seq("key"), Seq("value"), salts = 8)
      .as[(String, Double, Long)].collect().map { case (k, sm, n) => k -> ((sm, n)) }.toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == plain(k)._2, s"count mismatch for $k")
      assert(math.abs(s - plain(k)._1) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("saltedJoin returns row-for-row the plain join, sharded on (key, salt)") {
    val plain = skewed.join(dim, Seq("key"))
      .select($"key", $"id", $"segment").as[(String, Long, String)].collect().sorted.toSeq
    val joined = Skew.saltedJoin(skewed, dim, "key", salts = 8)
    val salted = joined.select($"key", $"id", $"segment")
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    // the join key really includes the salt: a hot key spreads over shuffle
    // partitions instead of landing on one
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column absent from the physical plan:\n$p")
  }

  test("saltedJoin left semantics: unmatched big rows survive with nulls") {
    val partialDim = Seq(("hot", "seg")).toDF("key", "segment")
    val out = Skew.saltedJoin(skewed, partialDim, "key", salts = 4, joinType = "left")
    assert(out.count() == skewed.count())
    assert(out.filter($"segment".isNull).count() == skewed.filter($"key" =!= "hot").count())
  }
}

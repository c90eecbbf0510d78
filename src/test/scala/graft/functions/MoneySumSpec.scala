package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MoneySum must be bit-identical to the decimal formulation it replaces —
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)` — since that formulation
  * is what the DuckDB oracle mirrors. */
class MoneySumSpec extends SparkSpec {
  import spark.implicits._

  private def dec(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  test("bit-exact vs the decimal formulation on real lineitem money expressions") {
    val li = sf("sf0.01", "lineitem")
    val exprs = Seq(
      col("l_quantity"),
      col("l_extendedprice"),
      col("l_extendedprice") * (lit(1) - col("l_discount")),
      col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")),
      col("l_discount"))
    val row = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (exprs.map(e => dec(e)) ++ exprs.map(e => MoneySum.money_sum(e))): _*)
      .collect()
    row.foreach { r =>
      (0 until exprs.length).foreach { i =>
        val d = r.getDouble(2 + i)
        val m = r.getDouble(2 + exprs.length + i)
        assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(m),
          s"group ${r.get(0)} expr $i: decimal $d vs money_sum $m")
      }
    }
  }

  test("bit-exact on adversarial many-decimal values and negatives") {
    // values exercising HALF_UP boundaries, negatives, and magnitude spread
    val rng = new graft.gen.Mulberry32(42L)
    val vals = (1 to 20000).map { i =>
      (i % 7).toLong -> ((rng.next() * 1e7).floor / 1e3 - 5000.0) * (1.0 + i / 997.0)
    }
    val df = vals.toDF("g", "x")
    val rows = df.groupBy($"g")
      .agg(dec($"x").as("d"), MoneySum.money_sum($"x").as("m"))
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, d, m) =>
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(m),
        s"group $g: $d vs $m")
    }
  }

  test("bit-exact on rounding midpoints (the fast path's slow-path guard)") {
    // 7th-decimal '5' midpoints: exactly where nearest-integer on d*1e6
    // diverges from HALF_UP on the shortest decimal representation — these
    // must detour to the BigDecimal path
    val vals = (1 to 5000).flatMap { i =>
      val base = i * 37 % 1000
      Seq(1L -> (base + 0.0000005), 2L -> -(base + 0.0000005),
        3L -> (base + 0.9999995), 4L -> (base + i * 1e-7))
    }
    val df = vals.toDF("g", "x")
    val rows = df.groupBy($"g")
      .agg(dec($"x").as("d"), MoneySum.money_sum($"x").as("m"))
      .as[(Long, Double, Double)].collect()
    assert(rows.length == 4)
    rows.foreach { case (g, d, m) =>
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(m),
        s"group $g: $d vs $m")
    }
  }

  test("property: 1M random magnitudes and signs are bit-identical to decimal") {
    // randomized closure of the fast-path guard's hand proof: engine-side
    // deterministic pseudo-random doubles spanning sign x mantissa x
    // magnitude 1e-7..1e11 (decimal(18,6)'s domain), 211 groups, compared
    // group-wise against the decimal formulation at the bit level
    val df = spark.range(1000000L).select(
      pmod(col("id"), lit(211)).as("g"),
      (when(pmod(xxhash64(col("id"), lit(1)), lit(2)) === 0, 1.0).otherwise(-1.0) *
        (abs(xxhash64(col("id"), lit(2))).cast("double") / 9.223372036854776e18) *
        pow(lit(10.0), (pmod(xxhash64(col("id"), lit(3)), lit(18)) - 6).cast("double"))
      ).as("x"))
    val rows = df.groupBy($"g")
      .agg(dec($"x").as("d"), MoneySum.money_sum($"x").as("m"))
      .as[(Long, Double, Double)].collect()
    assert(rows.length == 211)
    rows.foreach { case (g, d, m) =>
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(m),
        s"group $g: decimal $d vs money_sum $m")
    }
  }

  test("property: guard boundary neighborhoods (|x-r| near 0.42, |r| near 1e14)") {
    // the static guard admits |x-r| < 0.42 and |r| < 1e14; sample values
    // whose micros-fraction straddles 0.42/0.4375/0.5 and whose micros
    // magnitude straddles 1e14, both signs — every sample must agree with
    // the decimal formulation bit-for-bit regardless of which path fires
    val fracs = Seq(0.4199999, 0.42, 0.4200001, 0.4374999, 0.4375,
      0.4999999, 0.5, 0.5000001)
    val near = for { k <- 1 to 2000; f <- fracs; s <- Seq(1.0, -1.0) }
      yield ((k % 13).toLong, s * (k * 997L + f) / 1e6)
    val mag = for { k <- -2000 to 2000; s <- Seq(1.0, -1.0) }
      yield (20L + (k % 7).toLong, s * (1e14 + k) / 1e6)
    val df = (near ++ mag).toDF("g", "x")
    val rows = df.groupBy($"g")
      .agg(dec($"x").as("d"), MoneySum.money_sum($"x").as("m"))
      .as[(Long, Double, Double)].collect()
    assert(rows.length == 26)
    rows.foreach { case (g, d, m) =>
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(m),
        s"group $g: decimal $d vs money_sum $m")
    }
  }

  test("null semantics: empty input sums to null, null rows are skipped") {
    val df = Seq((1L, Some(2.5)), (1L, None), (2L, None)).toDF("g", "x")
    val rows = df.groupBy($"g")
      .agg(dec($"x").as("d"), MoneySum.money_sum($"x").as("m"))
      .collect().map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(rows(1L) == ((false, false)))
    assert(rows(2L) == ((true, true)))
  }
}

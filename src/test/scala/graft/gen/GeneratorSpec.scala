package graft.gen

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.config.Schemas
import graft.model._

class GeneratorSpec extends SparkSpec {

  private val N = 20000L
  private lazy val narrow =
    Generator.generate(spark, Schemas.narrowOrders, 1, N, seed = 1, numPartitions = Some(4)).cache()

  test("schema matches the spec types") {
    val s = narrow.schema
    assert(s("id").dataType == LongType)
    assert(s("user_name").dataType == StringType)
    assert(s("amount").dataType == DoubleType)
    assert(s("created_at").dataType == TimestampType)
    assert(s("age").dataType == IntegerType)
    assert(s("tags").dataType == ArrayType(StringType, containsNull = false))
  }

  test("id column is a dense pass-through of the range") {
    val r = narrow.agg(min("id"), max("id"), countDistinct("id")).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == N && r.getLong(2) == N)
  }

  test("int values respect [min,max] and null rate ~ p") {
    val r = narrow
      .agg(
        min("age"), max("age"),
        sum(when(col("age").isNull, 1).otherwise(0)).as("nulls"))
      .head()
    assert(r.getInt(0) >= 18 && r.getInt(1) <= 78)
    val nullRate = r.getLong(2).toDouble / N
    assert(nullRate > 0.02 && nullRate < 0.04, s"null rate $nullRate")
  }

  test("double values in range, 6-decimal rounded, null rate ~ 0.05") {
    val rows = narrow.select("amount").filter(col("amount").isNotNull).limit(1000).collect()
    rows.foreach { r =>
      val v = r.getDouble(0)
      assert(v >= 0 && v <= 10000)
      assert(math.abs(v * 1e6 - math.round(v * 1e6)) < 1e-3, s"not 6dp-rounded: $v")
    }
    val nulls = narrow.filter(col("amount").isNull).count().toDouble / N
    assert(nulls > 0.035 && nulls < 0.065, s"null rate $nulls")
  }

  test("strings have exact requested length and hex charset") {
    val bad = narrow
      .filter(col("note").isNotNull)
      .filter(length(col("note")) =!= 8 || col("note").rlike("[^0-9a-f]"))
      .count()
    assert(bad == 0L)
    assert(narrow.filter(length(col("user_name")) =!= 16).count() == 0L)
  }

  test("string lengths beyond 32 are fully generated (multi-block)") {
    val cfg = TableConfig("c", "s", "t", columns = Seq("s35" -> StringSpec(35)))
    val df = Generator.generate(spark, cfg, 1, 100, 1, Some(1))
    assert(df.filter(length(col("s35")) =!= 35).count() == 0L)
  }

  test("enum values come from the vocabulary; nullable enum has nulls") {
    val vocab = Set("new", "paid", "delivered", "canceled")
    val distinctStatus =
      narrow.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(distinctStatus == vocab)
    val countryRate = narrow.filter(col("country").isNull).count().toDouble / N
    assert(countryRate > 0.01 && countryRate < 0.03, s"null rate $countryRate")
  }

  test("timestamps uniform in [start, end) at second granularity") {
    val r = narrow
      .agg(min("created_at").cast(LongType), max("created_at").cast(LongType))
      .head()
    val s = java.time.LocalDate.parse("2024-01-01").atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val e = java.time.LocalDate.parse("2025-01-01").atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    assert(r.getLong(0) >= s && r.getLong(1) < e)
    // second granularity: no sub-second component
    assert(narrow.filter(date_format(col("created_at"), "SSS") =!= "000").count() == 0L)
  }

  test("array lengths within [minLen,maxLen], elements from vocabulary, null rate ~0.1") {
    val vocab = Set("alpha", "beta", "gamma", "delta")
    val withTags = narrow.filter(col("tags").isNotNull)
    assert(withTags.filter(size(col("tags")) < 1 || size(col("tags")) > 3).count() == 0L)
    val elems = withTags
      .select(explode(col("tags")).as("t")).distinct().collect().map(_.getString(0)).toSet
    assert(elems == vocab)
    val nullRate = narrow.filter(col("tags").isNull).count().toDouble / N
    assert(nullRate > 0.08 && nullRate < 0.12, s"null rate $nullRate")
  }

  test("generation is deterministic and partition-invariant") {
    val a = Generator.generate(spark, Schemas.narrowOrders, 1, 5000, 1, Some(1))
    val b = Generator.generate(spark, Schemas.narrowOrders, 1, 5000, 1, Some(7))
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
    // different seed → different data
    val c = Generator.generate(spark, Schemas.narrowOrders, 1, 5000, 2, Some(1))
    assert(a.exceptAll(c).count() > 0L)
  }

  test("batched generation over id sub-ranges equals one-shot generation") {
    val whole = Generator.generate(spark, Schemas.narrowOrders, 1, 6000, 1, Some(2))
    val parts = Seq((1L, 2000L), (2001L, 2000L), (4001L, 2000L)).map { case (s, n) =>
      Generator.generate(spark, Schemas.narrowOrders, s, n, 1, Some(2))
    }.reduce(_ unionAll _)
    assert(whole.exceptAll(parts).count() == 0L && parts.exceptAll(whole).count() == 0L)
  }

  test("wide events schema: 90 columns, enum vocab parity, value sanity") {
    val df = Generator.generate(spark, Schemas.wideEvents, 1, 2000, 1, Some(2)).cache()
    assert(df.columns.length == 90)
    // row_28 vocabulary = first 5 len-1 Mulberry32(seed 1) strings
    val vocab = Rng.generateRandomStrings(5, 1).toSet
    val got = df.select("row_28").distinct().collect().map(_.getString(0)).toSet
    assert(got.subsetOf(vocab) && got.nonEmpty)
    assert(df.filter(length(col("row_32")) =!= 35).count() == 0L)
    val r9 = df.filter(col("row_9").isNotNull).agg(min("row_9"), max("row_9")).head()
    assert(r9.getInt(0) >= 1000 && r9.getInt(1) <= 10000)
    df.unpersist()
  }
}

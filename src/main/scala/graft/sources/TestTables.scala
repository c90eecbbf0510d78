package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessors for the driver's deterministic parquet fixtures
  * (/root/testdata/sf*, see TESTDATA.md).
  *
  * Some driver generations store the `events.ts` column as parquet
  * TIMESTAMP(NANOS), which Spark rejects outright ([PARQUET_TYPE_ILLEGAL])
  * while DuckDB silently truncates to µs; others write plain
  * TIMESTAMP(MICROS). We read nanos as a raw Long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and, ONLY when the column
  * actually surfaces as a Long, floor-divide by 1000 — integral `div`, not
  * `/`, because ns epochs (~1.7e18) exceed double's 2^53 mantissa — giving
  * exactly DuckDB's µs truncation so oracle comparisons agree. A µs
  * generation already arrives as a timestamp and passes through untouched.
  */
object TestTables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver owns the session, so the engine's optimizer rules are
    // registered here — the common entry point of every driver query.
    graft.plans.CheapFirstFilterOrder.install(spark)
    name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // µs generations surface as TIMESTAMP_NTZ; every entrypoint pins
          // spark.sql.session.timeZone=UTC, so this cast is value-identical
          // wall-clock and restores the TimestampType the whole query corpus
          // (unix_micros projections, watermarks) was written against.
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    case _ => spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

package graft.ddl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.CodecSpec

/** The table-format seam: the complete surface the engine needs from a
  * storage/table format — batch commit, read-back, and the two metadata
  * aggregations the reference takes from Iceberg's `$files` / `$manifests`
  * views (reference: src/commands/bench.ts:124-168).
  *
  * The default [[HadoopPathFormat]] implements it as codec-tuned
  * Parquet/ORC directory trees (no Iceberg runtime ships in this offline
  * environment). An Iceberg-backed implementation is a drop-in: `writeBatch`
  * becomes an `append` to an Iceberg table with
  * `write.parquet.compression-codec`/`-level` table properties, `read` a
  * `spark.read.format("iceberg")` load, `dataBytes`/`manifestBytes` the
  * `SUM(file_size_in_bytes)` metadata-table aggregates — with zero changes
  * to callers ([[graft.load.Loader]], [[graft.measure.Sizes]],
  * [[graft.bench.BenchMain]]).
  */
trait TableFormat {

  /** Commit one load batch. Batches from concurrent jobs must never share a
    * commit scope (directory or transaction). */
  def writeBatch(
      df: DataFrame,
      path: String,
      batchIndex: Int,
      codec: CodecSpec,
      format: String = "PARQUET",
      partitioning: Seq[String] = Nil,
      sortedBy: Seq[String] = Nil): Unit

  /** Read the whole table (all batches). */
  def read(spark: SparkSession, path: String, format: String = "PARQUET"): DataFrame

  /** Total data-file bytes — the `$files` `SUM(file_size_in_bytes)`. */
  def dataBytes(spark: SparkSession, path: String): Long

  /** Total manifest/metadata bytes — the `$manifests` sum; 0 for formats
    * without a metadata layer. */
  def manifestBytes(spark: SparkSession, path: String): Long
}

/** Plain-filesystem implementation: Parquet/ORC trees with one
  * `batch=<i>` subdirectory per commit ([[Tables]]), byte counts from a
  * recursive listing. The production default in this environment. */
object HadoopPathFormat extends TableFormat {
  override def writeBatch(df: DataFrame, path: String, batchIndex: Int,
      codec: CodecSpec, format: String, partitioning: Seq[String],
      sortedBy: Seq[String]): Unit =
    Tables.writeBatch(df, path, batchIndex, codec, format, partitioning, sortedBy)

  override def read(spark: SparkSession, path: String, format: String): DataFrame =
    Tables.read(spark, path, format)

  override def dataBytes(spark: SparkSession, path: String): Long =
    graft.measure.Sizes.listDataBytes(spark, path)

  /** Plain directories carry no manifests. */
  override def manifestBytes(spark: SparkSession, path: String): Long = 0L
}

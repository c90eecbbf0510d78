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

/** Minimal manifest-backed table format — the seam's second REAL
  * implementation, proving callers ([[graft.load.Loader]],
  * [[graft.measure.Sizes]]) run unchanged against a format with a metadata
  * layer (the Iceberg-shaped contract, reference: src/commands/bench.ts:
  * 124-168, exercised here with `manifest_bytes ≠ 0`).
  *
  * Each batch commit writes the data tree exactly as [[HadoopPathFormat]],
  * then records one JSON manifest under `<path>/_manifests/` listing every
  * committed data file with its byte length (written to a temp name and
  * renamed, so a manifest is visible only complete — the crash-safety
  * property real formats get from atomic metadata swaps). The manifests are
  * LOAD-BEARING, not decorative:
  *
  *  - [[read]] enumerates data files FROM the manifests — a file present on
  *    disk but absent from every manifest (a torn write) is invisible, the
  *    defining read-isolation property of manifest-based formats;
  *  - [[dataBytes]] answers from manifest metadata alone, no file listing —
  *    the `$files SUM(file_size_in_bytes)` semantics (at 100 TB a recursive
  *    listing of millions of files is an outage; reading kilobytes of
  *    manifests is not).
  *
  * The `_manifests` directory is `_`-prefixed, so data-path listings and
  * Spark's file index both skip it. */
object ManifestSidecarFormat extends TableFormat {
  import org.apache.hadoop.fs.{FileSystem, Path}

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifests")

  override def writeBatch(df: DataFrame, path: String, batchIndex: Int,
      codec: CodecSpec, format: String, partitioning: Seq[String],
      sortedBy: Seq[String]): Unit = {
    Tables.writeBatch(df, path, batchIndex, codec, format, partitioning, sortedBy)
    val hfs = fs(df.sparkSession, path)
    val batchDir = new Path(path, s"batch=$batchIndex")
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = hfs.listFiles(batchDir, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val rel = f.getPath.toUri.getPath.stripPrefix(
          batchDir.toUri.getPath).stripPrefix("/")
        files += ((s"batch=$batchIndex/$rel", f.getLen))
      }
    }
    val entries = files.sortBy(_._1).map { case (p, len) =>
      s"""{"path":"$p","bytes":$len}""" }.mkString(",\n  ")
    val body =
      s"""{"batch":$batchIndex,"format":"${format.toUpperCase}","n_files":${files.size},"total_bytes":${files.map(_._2).sum},"files":[
  $entries
]}
"""
    val dir = manifestDir(path)
    hfs.mkdirs(dir)
    val tmp = new Path(dir, s".batch-$batchIndex.json.tmp")
    val dst = new Path(dir, s"batch-$batchIndex.json")
    val out = hfs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (hfs.exists(dst)) hfs.delete(dst, false)
    require(hfs.rename(tmp, dst), s"manifest commit failed for batch $batchIndex")
  }

  /** (manifest path, parsed (file path, bytes) entries) for every committed
    * manifest, in batch order. */
  private def manifests(spark: SparkSession, path: String): Seq[(Path, Seq[(String, Long)])] = {
    val hfs = fs(spark, path)
    val dir = manifestDir(path)
    if (!hfs.exists(dir)) return Nil
    val entry = """\{"path":"([^"]+)","bytes":(\d+)\}""".r
    hfs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.endsWith(".json"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val in = hfs.open(s.getPath)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        (s.getPath,
          entry.findAllMatchIn(txt).map(m => (m.group(1), m.group(2).toLong)).toSeq)
      }
  }

  override def read(spark: SparkSession, path: String, format: String): DataFrame = {
    val files = manifests(spark, path).flatMap(_._2).map { case (rel, _) => s"$path/$rel" }
    require(files.nonEmpty, s"no committed manifests under $path")
    spark.read.format(format.toLowerCase).option("basePath", path).load(files: _*)
  }

  /** Answered from manifest metadata alone — no file listing. */
  override def dataBytes(spark: SparkSession, path: String): Long =
    manifests(spark, path).flatMap(_._2).map(_._2).sum

  override def manifestBytes(spark: SparkSession, path: String): Long = {
    val hfs = fs(spark, path)
    manifests(spark, path).map { case (p, _) => hfs.getFileStatus(p).getLen }.sum
  }
}

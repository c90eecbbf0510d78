package graft.ddl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{CodecSpec, TableConfig}

/** Catalog introspection — the Spark mapping of the reference's documented
  * `SHOW CATALOGS/SCHEMAS/TABLES/COLUMNS`, `DESCRIBE`, `SHOW CREATE TABLE`,
  * `$properties`, and node-version queries (reference: README.md:43-62,
  * temp.md:6-13; SURVEY §2.B18).
  *
  * Variant directories and the driver's parquet fixtures register as temp
  * views so the whole SQL introspection surface (and ad-hoc `spark.sql`)
  * works against them.
  */
object Catalog {

  val TestTableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the driver's parquet fixtures as temp views. */
  def registerTestTables(spark: SparkSession, dir: String): Unit =
    TestTableNames.foreach { t =>
      graft.sources.TestTables.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Per-table storage/write properties recorded at registration — the
    * backing store of the `$properties` view. Keyed per session+table so
    * concurrent sessions don't cross-talk. */
  private val propertyRegistry =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Map[String, String]]

  private def recordProperties(spark: SparkSession, table: String,
      props: Map[String, String]): Unit =
    propertyRegistry.put((System.identityHashCode(spark), table), props)

  /** Register every variant of a table config found under the warehouse.
    * Each variant's storage properties (format/codec/level/location/
    * partitioning) are recorded for [[tableProperties]]. */
  def registerVariants(spark: SparkSession, warehouse: String, cfg: TableConfig,
      codecs: Seq[CodecSpec]): Seq[String] =
    codecs.flatMap { c =>
      val name = Tables.variantName(cfg.tableBase, c)
      val path = Tables.variantPath(warehouse, cfg, c)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path))) {
        Tables.read(spark, path, cfg.format).createOrReplaceTempView(name)
        recordProperties(spark, name, Map(
          "format" -> cfg.format.toLowerCase,
          "write.compression-codec" -> c.codec,
          "write.compression-level" -> c.level.toString,
          "location" -> path,
          "partitioning" -> cfg.partitioning.mkString(", ")
        ) ++ cfg.tableProperties)
        Some(name)
      } else None
    }

  /** `SHOW TABLES` (reference: README.md:47). */
  def showTables(spark: SparkSession): DataFrame = spark.sql("SHOW TABLES")

  /** `DESCRIBE t` / `SHOW COLUMNS` (reference: README.md:49-53, temp.md:8). */
  def describeTable(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $table")

  /** `SHOW CREATE TABLE`-style DDL reconstructed from the schema
    * (temp views carry no stored DDL). */
  def showCreateTable(spark: SparkSession, table: String): String = {
    val fields = spark.table(table).schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}")
    s"CREATE TABLE $table (\n${fields.mkString(",\n")}\n)"
  }

  /** `SHOW TBLPROPERTIES t` / `SELECT * FROM "t$properties"` analogue
    * (reference: README.md:55-58, temp.md:9): the storage and write
    * properties of a registered variant as (key, value) rows, sorted by key.
    * Empty for tables registered without properties (e.g. raw fixtures). */
  def tableProperties(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    propertyRegistry.getOrElse((System.identityHashCode(spark), table), Map.empty)
      .toSeq.sortBy(_._1).toDF("key", "value")
  }

  /** Engine version (reference: `SELECT node_version FROM system.runtime.nodes`,
    * temp.md:11-13). */
  def engineVersion(spark: SparkSession): String = spark.version
}

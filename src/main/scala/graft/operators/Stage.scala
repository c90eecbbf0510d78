package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning helpers shared by the corpus operators. */
object Stage {

  /** Widen a frame to the session's default parallelism ONLY when it arrives
    * narrower — e.g. a small parquet table read as a single split, which
    * would otherwise serialize a CPU-bound signature stage onto one core.
    *
    * When the input is already at least as wide as the core count — the
    * normal case at cluster scale, where a 100 TB table arrives as tens of
    * thousands of splits — this is the identity: no exchange is inserted and
    * the downstream stage stays scan-local. An unconditional `repartition()`
    * here would shuffle the full corpus payload before any work, and would
    * *reduce* parallelism whenever the input has more splits than cores.
    */
  def ensureWide(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

package graft.bench

import org.apache.spark.sql.SparkSession
import graft.ddl.Tables
import graft.model.CodecSpec

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .appName("scratch").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.read(spark, "/tmp/graft_matrix/lab/events_zstd_l06")
      .drop("batch").limit(1000000).cache()
    df.count()
    for (lvl <- Seq(1, 3, 9, 19)) {
      val p = s"/tmp/zstd_check_l$lvl"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
      Tables.writeBatch(df.coalesce(4), p, 0, CodecSpec("zstd", lvl))
      val bytes = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
      println(s"[scratch] zstd l$lvl -> $bytes bytes")
    }
    spark.stop()
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave produces textbook Morton codes") {
    // (x=0b10, y=0b11) → z = y1 x1 y0 x0 = 1 1 1 0 = 14
    val df = Seq((2L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq($"x", $"y"), bits = 2).as("z"))
    assert(df.head().getLong(0) == 14L)
    // identity on one column
    val one = Seq(5L).toDF("x").select(ZOrder.interleave(Seq($"x"), 3).as("z"))
    assert(one.head().getLong(0) == 5L)
  }

  test("zvalue orders the unit square along the Z curve") {
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
      .toDF("x", "y")
    val z = pts.select($"x", $"y",
        ZOrder.zvalue(Seq($"x", $"y"), Seq((0.0, 1.0), (0.0, 1.0)), bits = 1).as("z"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(z((0.0, 0.0)) == 0 && z((1.0, 0.0)) == 1)
    assert(z((0.0, 1.0)) == 2 && z((1.0, 1.0)) == 3)
  }

  test("clusterBy preserves rows exactly and empties pass through") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 7919) % 1000, (i * 104729) % 1000))
      .toDF("id", "a", "b")
    val out = ZOrder.clusterBy(df, Seq("a", "b"), numPartitions = 8)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.as[(Long, Int, Int)].collect().sorted.toSeq ==
      df.as[(Long, Int, Int)].collect().sorted.toSeq)
    val empty = ZOrder.clusterBy(Seq.empty[(Long, Int, Int)].toDF("id", "a", "b"),
      Seq("a", "b"))
    assert(empty.count() == 0)
  }

  test("clusterBy handles date and timestamp curve columns (ANSI-safe)") {
    val df = (1 to 500).map { i =>
      (i.toLong, java.sql.Date.valueOf(s"2024-0${1 + i % 9}-0${1 + i % 9}"),
        java.sql.Timestamp.valueOf(f"2024-01-01 0${i % 10}%01d:00:00"))
    }.toDF("id", "d", "ts")
    val out = ZOrder.clusterBy(df, Seq("d", "ts"), numPartitions = 4)
    assert(out.count() == 500)
    assert(out.columns.toSeq == Seq("id", "d", "ts"))
  }

  // mean per-file min/max span of `c`, as a fraction of the global span —
  // the quantity footer-stats file skipping is driven by
  private def meanSpan(written: DataFrame, c: String): Double = {
    val spans = written
      .groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
      .collect().map(_.getDouble(1))
    spans.sum / spans.length / 999.0
  }

  test("equi-depth clusterBy keeps rank-space locality on a skewed column") {
    // a: heavy head (u^8 pushes ~84% of rows into the bottom 2% of the value
    // range) — linear min/max scaling collapses them into one curve cell;
    // b: uniform
    val df = (1 to 20000).map { i =>
      val u = ((i * 7919) % 10007) / 10007.0
      (i.toLong, math.floor(math.pow(u, 8) * 100000).toLong, (i * 104729) % 1000)
    }.toDF("id", "a", "b")
    val eq = ZOrder.clusterByEquiDepth(df, Seq("a", "b"), bits = 4, numPartitions = 16)
    assert(eq.as[(Long, Long, Int)].collect().sorted.toSeq ==
      df.as[(Long, Long, Int)].collect().sorted.toSeq)

    // rank-space span: map each value of `a` to its global percent rank and
    // measure mean per-partition span — the quantity that predicts pruning
    // on a skewed column (value-space spans are meaningless on heavy tails)
    val aRank = df.select($"a").distinct().orderBy($"a").collect()
      .map(_.getLong(0)).zipWithIndex.toMap
    val nRanks = aRank.size.toDouble
    def meanRankSpan(clustered: org.apache.spark.sql.DataFrame): Double = {
      val spans = clustered.withColumn("pid", spark_partition_id())
        .groupBy($"pid").agg(collect_set($"a").as("as"))
        .collect().map { r =>
          val vs = r.getSeq[Long](1).map(aRank)
          (vs.max - vs.min) / nRanks
        }
      spans.sum / spans.length
    }
    val eqSpan = meanRankSpan(
      ZOrder.clusterByEquiDepth(df, Seq("a", "b"), bits = 4, numPartitions = 16))
    val linSpan = meanRankSpan(
      ZOrder.clusterBy(df, Seq("a", "b"), bits = 4, numPartitions = 16))
    info(f"mean per-partition rank-span of skewed col: equi-depth $eqSpan%.3f, linear $linSpan%.3f")
    assert(eqSpan < linSpan,
      f"equi-depth should narrow rank spans on skew: $eqSpan%.3f vs $linSpan%.3f")
    assert(eqSpan < 0.6, f"equi-depth rank span $eqSpan%.3f")
  }

  test("z-ordered files are narrow on BOTH columns; single-column sort is not") {
    // two independent uniform columns; 16 files
    val df = (1 to 20000).map { i =>
      (i.toLong, (i * 7919) % 1000, (i * 104729) % 1000)
    }.toDF("id", "a", "b")
    val dir = Files.createTempDirectory("zorder").toString

    ZOrder.clusterBy(df, Seq("a", "b"), numPartitions = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    val z = spark.read.parquet(s"$dir/z")
    val (za, zb) = (meanSpan(z, "a"), meanSpan(z, "b"))

    df.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(s"$dir/s")
    val s = spark.read.parquet(s"$dir/s")
    val (sa, sb) = (meanSpan(s, "a"), meanSpan(s, "b"))

    info(f"z-order spans a=$za%.3f b=$zb%.3f; sort-by-a spans a=$sa%.3f b=$sb%.3f")
    // sorting by a alone: a is tight, b covers ~the full range per file
    assert(sa < 0.15 && sb > 0.7)
    // the curve gives BOTH columns sub-half spans — every curve column is
    // file-prunable, the property single-column sort cannot provide
    assert(za < 0.5 && zb < 0.5, f"z spans a=$za%.3f b=$zb%.3f")
    assert(za + zb < sa + sb)
  }
}

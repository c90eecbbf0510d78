package graft.bench

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashExpressions
import graft.operators.{Dedup, Stage}
import graft.sources.TestTables

/** Scratch experiment: CappedPostings with primitive-array buffers (no
  * ArrayBuffer boxing, lazy allocation) measured against the shipped
  * ArrayBuffer implementation on the q23 pipeline. Not part of the
  * benchmark protocol. */
case class LeanPostings(
    idExpr: Expression,
    nExpr: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[LeanPostings.Buf] {
  require(cap > 0, "cap must be positive")
  override def children: Seq[Expression] = Seq(idExpr, nExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = graft.functions.CappedPostings.resultType
  override def checkInputDataTypes(): TypeCheckResult =
    (idExpr.dataType, nExpr.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, n) => TypeCheckResult.TypeCheckFailure(s"expects (bigint, int), got ($l, $n)")
    }
  override def createAggregationBuffer(): LeanPostings.Buf = new LeanPostings.Buf
  override def update(buf: LeanPostings.Buf, input: InternalRow): LeanPostings.Buf = {
    if (!buf.overflow) {
      val id = idExpr.eval(input)
      val n = nExpr.eval(input)
      if (id != null && n != null) {
        if (buf.m >= cap) buf.spill()
        else buf.add(id.asInstanceOf[Long], n.asInstanceOf[Int], cap)
      }
    }
    buf
  }
  override def merge(buf: LeanPostings.Buf, other: LeanPostings.Buf): LeanPostings.Buf = {
    if (buf.overflow || other.overflow || buf.m + other.m > cap) buf.spill()
    else {
      var i = 0
      while (i < other.m) { buf.add(other.ids(i), other.ns(i), cap); i += 1 }
    }
    buf
  }
  override def eval(buf: LeanPostings.Buf): Any = {
    if (buf.overflow) null
    else {
      val out = new Array[Any](buf.m)
      var i = 0
      while (i < buf.m) {
        out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.ns(i)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
  override def serialize(buf: LeanPostings.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + buf.m * 12)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putInt(buf.m)
    var i = 0
    while (i < buf.m) { bb.putLong(buf.ids(i)); bb.putInt(buf.ns(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): LeanPostings.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new LeanPostings.Buf
    b.overflow = bb.get() == 1.toByte
    val m = bb.getInt()
    if (m > 0) {
      b.ids = new Array[Long](m); b.ns = new Array[Int](m); b.m = m
      var i = 0
      while (i < m) { b.ids(i) = bb.getLong(); b.ns(i) = bb.getInt(); i += 1 }
    }
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): LeanPostings = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LeanPostings = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(idExpr = c(0), nExpr = c(1))
}

object LeanPostings {
  final class Buf {
    var ids: Array[Long] = null
    var ns: Array[Int] = null
    var m: Int = 0
    var overflow: Boolean = false
    def add(id: Long, n: Int, cap: Int): Unit = {
      if (ids == null) { ids = new Array[Long](4); ns = new Array[Int](4) }
      else if (m == ids.length) {
        val nc = math.min(math.max(ids.length * 2, 4), cap)
        ids = java.util.Arrays.copyOf(ids, nc)
        ns = java.util.Arrays.copyOf(ns, nc)
      }
      ids(m) = id; ns(m) = n; m += 1
    }
    def spill(): Unit = { overflow = true; ids = null; ns = null; m = 0 }
  }
  def lean_postings(id: Column, n: Column, cap: Int): Column =
    GraftBridge.toColumn(LeanPostings(
      GraftBridge.toExpression(id), GraftBridge.toExpression(n), cap)
      .toAggregateExpression())
}

object LeanPostingsProbe {
  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("PROBE_ITERS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-leanpostings")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = TestTables.documents(spark, sfDir)
    val threshold = 0.3
    val shingleLen = 3
    val maxShingleFreq = 1000
    val nParts = spark.sessionState.conf.numShufflePartitions

    def sh = Stage.ensureWide(docs.select(col("doc_id").as("id"), col("text").as("text")))
      .select(col("id"), toks(col("text")).as("tk"))
      .select(col("id"), HashExpressions.shingle_hashes(col("tk"), shingleLen).as("shs"))
      .select(col("id"), size(col("shs")).as("n_sh"), explode_outer(col("shs")).as("sh_h"))
      .filter(col("sh_h").isNotNull)
    def pipeline(agg: Column): DataFrame = {
      val postings = sh.groupBy(col("sh_h")).agg(agg.as("docs"))
        .filter(col("docs").isNotNull && size(col("docs")) >= 2)
      val pairs = postings
        .select(explode(col("docs")).as("a"), col("docs"))
        .select(col("a"), explode(col("docs")).as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .repartition(nParts, col("id_a"), col("id_b"))
      pairs.groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("inter"))
        .select(col("id_a"), col("id_b"),
          round(col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    def shipped = pipeline(graft.functions.CappedPostings
      .capped_postings(col("id"), col("n_sh"), maxShingleFreq))
    def lean = pipeline(LeanPostings.lean_postings(col("id"), col("n_sh"), maxShingleFreq))
    // aggregate-only probes (posting stage in isolation)
    def shippedAgg = sh.groupBy(col("sh_h")).agg(graft.functions.CappedPostings
      .capped_postings(col("id"), col("n_sh"), maxShingleFreq).as("docs"))
    def leanAgg = sh.groupBy(col("sh_h")).agg(
      LeanPostings.lean_postings(col("id"), col("n_sh"), maxShingleFreq).as("docs"))

    def runNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def hashOf(df: DataFrame): Long =
      df.select(xxhash64(col("id_a"), col("id_b"), col("jaccard")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    val h0 = hashOf(shipped); val h1 = hashOf(lean)
    println(s"[leanprobe] hash ${if (h0 == h1) "OK" else s"MISMATCH $h0 vs $h1"}")
    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "q23_shipped" -> (() => shipped), "q23_lean" -> (() => lean),
        "agg_shipped" -> (() => shippedAgg), "agg_lean" -> (() => leanAgg))) {
      (1 to 2).foreach(_ => runNoop(mk()))
      val ts = (1 to iters).map(_ => runNoop(mk()))
      println(f"[leanprobe] $name min=${ts.min}%.4f mean=${ts.sum / ts.size}%.4f " +
        ts.map(x => f"$x%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

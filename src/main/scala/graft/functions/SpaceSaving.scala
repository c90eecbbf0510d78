package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitter summary (Metwally et al. 2005), as a mergeable
  * typed aggregate.
  *
  * `space_saving_topk(item, counters, outK)` maintains at most `counters`
  * (item → est, err) entries per partial buffer: a tracked item increments
  * its estimate; an untracked item arriving at a full summary EVICTS the
  * current minimum and inherits its estimate (+1) with `err` = that
  * minimum. Invariants (the classic ones): `est ≥ true ≥ est − err` for
  * every tracked item, and any item with true frequency > N/counters is
  * guaranteed tracked.
  *
  * The scale story vs the exact top-k (`TextOps.topNgrams`): exact heavy
  * hitters shuffle one row per DISTINCT key (a web corpus has billions of
  * n-grams); this aggregate ships `counters` rows per partition — the
  * exchange is O(partitions × counters), independent of both corpus size
  * and key cardinality, which is also exactly why it works as
  * per-micro-batch state in a stream. Merge follows the mergeable-summaries
  * construction (Agarwal et al. 2012): keys absent from one side are
  * charged that side's minimum estimate (count AND error), then the
  * combined summary is re-trimmed to `counters`, preserving both
  * invariants.
  *
  * Approximation is the whole point, so this is deliberately NOT in the
  * oracle program (DuckDB cannot replay eviction order); it is spec-gated
  * against exact counts instead: presence of every guaranteed hitter and
  * the est/err sandwich are asserted, not sampled.
  *
  * Eviction scans the k counters linearly — O(k) per untracked arrival at
  * a full summary. For the intended k (hundreds to a few thousand) this
  * beats a heap's allocation churn; a min-heap drops in behind the same
  * buffer contract if a profile ever says otherwise.
  */
case class SpaceSavingTopK(
    itemExpr: Expression,
    counters: Int,
    outK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[SpaceSavingTopK.Buf] {
  require(counters > 0, "counters must be positive")
  require(outK > 0 && outK <= counters, "outK must be in [1, counters]")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingTopK.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    itemExpr.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"space_saving_topk expects a string item, got $t")
    }

  override def createAggregationBuffer(): SpaceSavingTopK.Buf =
    new SpaceSavingTopK.Buf(mutable.HashMap.empty)

  override def update(buf: SpaceSavingTopK.Buf, input: InternalRow): SpaceSavingTopK.Buf = {
    val v = itemExpr.eval(input)
    if (v != null) {
      // copy out of the reused UnsafeRow-backed UTF8String
      buf.add(v.asInstanceOf[UTF8String].toString, 1L, 0L, counters)
    }
    buf
  }

  override def merge(buf: SpaceSavingTopK.Buf, other: SpaceSavingTopK.Buf): SpaceSavingTopK.Buf = {
    // Mergeable-summaries rule: a key absent from one FULL side may have
    // been evicted there with estimate up to that side's minimum — charge
    // the minimum to both est and err so the sandwich invariant survives.
    val minBuf = buf.minIfFull(counters)
    val minOther = other.minIfFull(counters)
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (buf.m.keySet ++ other.m.keySet).foreach { key =>
      val (cA, eA) = buf.m.getOrElse(key, (minBuf, minBuf))
      val (cB, eB) = other.m.getOrElse(key, (minOther, minOther))
      merged(key) = (cA + cB, eA + eB)
    }
    val trimmed =
      if (merged.size <= counters) merged
      else {
        val keep = merged.toSeq
          .sortBy { case (key, (c, _)) => (-c, key) }
          .take(counters)
        mutable.HashMap(keep: _*)
      }
    new SpaceSavingTopK.Buf(trimmed)
  }

  override def eval(buf: SpaceSavingTopK.Buf): Any = {
    val top = buf.m.toSeq
      .sortBy { case (key, (c, _)) => (-c, key) }
      .take(outK)
    new GenericArrayData(top.map { case (key, (c, e)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(key), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: SpaceSavingTopK.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (key, (c, e)) =>
      // length-prefixed UTF-8, not writeUTF: writeUTF throws on keys whose
      // encoding exceeds 65535 bytes, and a tracked item is arbitrary text
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val key = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      m(key) = (c, e)
      i += 1
    }
    new SpaceSavingTopK.Buf(m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object SpaceSavingTopK {
  /** Summary state: item → (est, err). */
  final class Buf(val m: mutable.HashMap[String, (Long, Long)]) {
    def add(item: String, c: Long, e: Long, counters: Int): Unit =
      m.get(item) match {
        case Some((c0, e0)) => m(item) = (c0 + c, e0 + e)
        case None if m.size < counters => m(item) = (c, e)
        case None =>
          // evict the minimum estimate (ties by key for determinism)
          var minKey: String = null
          var minC = Long.MaxValue
          m.foreach { case (k, (ck, _)) =>
            if (ck < minC || (ck == minC && (minKey == null || k < minKey))) {
              minC = ck; minKey = k
            }
          }
          m.remove(minKey)
          m(item) = (minC + c, minC + e)
      }

    def minIfFull(counters: Int): Long =
      if (m.size < counters) 0L
      else m.valuesIterator.map(_._1).min
  }

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Column API: top-`outK` heavy hitters from a `counters`-slot summary. */
  def space_saving_topk(item: Column, counters: Int, outK: Int): Column =
    GraftBridge.toColumn(SpaceSavingTopK(
      GraftBridge.toExpression(item), counters, outK)
      .toAggregateExpression())
}

package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Capped inverted-index posting collection.
  *
  * `capped_postings(id, n, cap)` groups into an `array<struct<id:bigint,
  * n:int>>` of at most `cap` entries — and yields NULL the moment a group
  * exceeds the cap, releasing the partial buffer immediately.
  *
  * This is the memory-safe form of `collect_list` for Zipfian keys: a
  * training-corpus shingle index has keys ("the quick brown") matched by a
  * large fraction of all documents, and an uncapped collect on such a key
  * builds an unbounded in-memory list on one executor. Here the hot keys are
  * exactly the ones the similarity join must DROP anyway (they contribute
  * quadratic candidate pairs and no signal), so the cap both bounds memory
  * at `cap + 1` entries per group and implements the frequency cutoff in the
  * same single aggregation pass — no separate frequency count, no second
  * scan of the corpus, no re-join against a filtered key set.
  */
case class CappedPostings(
    idExpr: Expression,
    nExpr: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedPostings.Buf] {
  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(idExpr, nExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = CappedPostings.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    (idExpr.dataType, nExpr.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, n) => TypeCheckResult.TypeCheckFailure(
        s"capped_postings expects (bigint, int), got ($l, $n)")
    }

  override def createAggregationBuffer(): CappedPostings.Buf =
    new CappedPostings.Buf(new ArrayBuffer[Long], new ArrayBuffer[Int], false)

  override def update(buf: CappedPostings.Buf, input: InternalRow): CappedPostings.Buf = {
    if (!buf.overflow) {
      val id = idExpr.eval(input)
      val n = nExpr.eval(input)
      if (id != null && n != null) {
        if (buf.ids.length >= cap) buf.spill()
        else {
          buf.ids += id.asInstanceOf[Long]
          buf.ns += n.asInstanceOf[Int]
        }
      }
    }
    buf
  }

  override def merge(buf: CappedPostings.Buf, other: CappedPostings.Buf): CappedPostings.Buf = {
    if (buf.overflow || other.overflow ||
        buf.ids.length + other.ids.length > cap) buf.spill()
    else {
      buf.ids ++= other.ids
      buf.ns ++= other.ns
    }
    buf
  }

  override def eval(buf: CappedPostings.Buf): Any = {
    if (buf.overflow) null
    else {
      val out = new Array[Any](buf.ids.length)
      var i = 0
      while (i < buf.ids.length) {
        out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.ns(i)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: CappedPostings.Buf): Array[Byte] = {
    val m = buf.ids.length
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + m * 12)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putInt(m)
    var i = 0
    while (i < m) { bb.putLong(buf.ids(i)); bb.putInt(buf.ns(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedPostings.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val overflow = bb.get() == 1.toByte
    val m = bb.getInt()
    val ids = new ArrayBuffer[Long](m)
    val ns = new ArrayBuffer[Int](m)
    var i = 0
    while (i < m) { ids += bb.getLong(); ns += bb.getInt(); i += 1 }
    new CappedPostings.Buf(ids, ns, overflow)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedPostings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedPostings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), nExpr = newChildren(1))
}

object CappedPostings {
  /** Mutable aggregation state: parallel (id, n) columns + overflow flag.
    * Once over the cap the arrays are freed — the group is already doomed. */
  final class Buf(val ids: ArrayBuffer[Long], val ns: ArrayBuffer[Int],
      var overflow: Boolean) {
    def spill(): Unit = { overflow = true; ids.clear(); ns.clear() }
  }

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = false))), containsNull = false)

  /** Column API: postings of (id, n) capped at `cap`, NULL past the cap. */
  def capped_postings(id: Column, n: Column, cap: Int): Column =
    GraftBridge.toColumn(CappedPostings(
      GraftBridge.toExpression(id), GraftBridge.toExpression(n), cap)
      .toAggregateExpression())
}

package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact money sum: bit-identical to
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)` — the engine's
  * cross-engine exactness recipe — at integer-accumulation speed.
  *
  * Spark's decimal SUM promotes the accumulator past 18 digits, which drops
  * it off the Long-backed fast path: every row pays a BigDecimal add per
  * aggregate column. This aggregate performs the *same per-row conversion*
  * Spark's double→decimal cast does (`BigDecimal.valueOf(d)` — the shortest
  * round-trip decimal — then `setScale(6, HALF_UP)`), but accumulates the
  * unscaled micro-units in a signed 128-bit integer (two longs, overflow-
  * proof for any corpus: 2^127 micro-units ≈ 1.7e32 money units), and only
  * materializes a BigDecimal once per group at eval — the same
  * `BigDecimal → double` final conversion as the decimal formulation, so
  * results hash-match it exactly (MoneySumSpec asserts this on real data).
  */
case class MoneySum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"money_sum expects a double column, got $other")
  }

  /** buffer = [hi, lo, seen] — signed 128-bit two's-complement micros plus
    * a has-any-input flag (SUM over no rows is NULL). */
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L, 0L)

  private def add128(buf: Array[Long], mHi: Long, mLo: Long): Unit = {
    val lo = buf(1)
    val newLo = lo + mLo
    // unsigned carry out of the low word
    val carry = ((lo & mLo) | ((lo | mLo) & ~newLo)) >>> 63
    buf(0) += mHi + carry
    buf(1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      // Fast path: identical result to the BigDecimal slow path below,
      // proven by a midpoint guard. The slow path rounds the SHORTEST
      // decimal representation s of d (that is what BigDecimal.valueOf
      // rounds) half-up at 6 dp. With x = fl(d*1e6) and r = nearest
      // integer to x, both |s*1e6 - d*1e6| (half-ulp of d, scaled) and
      // |x - d*1e6| (half-ulp of x) are within ~1.5*ulp(x), so whenever x
      // is further than 4*ulp(x) from a rounding midpoint, s*1e6 lies
      // strictly inside (r-0.5, r+0.5) and rounds to r under any
      // half-rounding rule. Near-midpoint values (~1e-10 of inputs) and
      // near-overflow magnitudes take the slow path and stay bit-exact.
      val x = d * 1e6
      val r = Math.rint(x)
      if (Math.abs(x - r) < 0.5 - 4 * Math.ulp(x) && Math.abs(r) < 1e18) {
        val micros = r.toLong
        add128(buf, micros >> 63, micros)
        buf(2) = 1L
      } else {
        // identical rounding to Spark's Cast(double -> decimal(18,6)); a
        // value that overflows decimal(18,6) casts to NULL there, so skip
        // it here too
        val dec = JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)
        if (dec.precision() <= 18) {
          val micros = dec.unscaledValue().longValueExact()
          add128(buf, micros >> 63, micros)
          buf(2) = 1L
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    add128(buf, other(0), other(1))
    buf(2) |= other(2)
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(2) == 0L) null
    else {
      val unscaled = BigInteger.valueOf(buf(0)).shiftLeft(64)
        .add(new BigInteger(java.lang.Long.toUnsignedString(buf(1))))
      new JBigDecimal(unscaled, 6).doubleValue()
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.putLong(buf(0)); bb.putLong(buf(1)); bb.putLong(buf(2))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong(), bb.getLong(), bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MoneySum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MoneySum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MoneySum {
  /** Column API: exact decimal(18,6) money sum as double. */
  def money_sum(c: Column): Column =
    GraftBridge.toColumn(MoneySum(GraftBridge.toExpression(c)).toAggregateExpression())
}

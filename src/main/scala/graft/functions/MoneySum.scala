package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

/** Exact money sum: bit-identical to
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)` — the engine's
  * cross-engine exactness recipe — at integer-accumulation speed.
  *
  * Spark's decimal SUM promotes the accumulator past 18 digits, which drops
  * it off the Long-backed fast path: every row pays a BigDecimal add per
  * aggregate column (measured 0.88 s for the q01 aggregate at sf0.1 vs this
  * aggregate's 0.30 s class). This aggregate performs the *same per-row
  * conversion* Spark's double→decimal cast does (round the shortest decimal
  * representation of d half-up at 6 dp), but accumulates the unscaled
  * micro-units in a signed 128-bit integer (two longs, overflow-proof for
  * any corpus: 2^127 micro-units ≈ 1.7e32 money units), and only
  * materializes a BigDecimal once per group at eval — the same
  * `BigDecimal → double` final conversion as the decimal formulation, so
  * results hash-match it exactly (MoneySumSpec asserts this on real data,
  * adversarial values, and HALF_UP midpoints).
  *
  * r15: rewritten from a [[org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate]]
  * to a [[DeclarativeAggregate]] (guide step 4 — eliminate non-codegen
  * operators in the hot path). The imperative form forced the whole
  * aggregation onto ObjectHashAggregateExec and evaluated its input
  * expression INTERPRETED per row (`child.eval`), which priced q01's
  * six-column aggregate at ~2× the built-in-sum floor (0.49 s vs 0.24 s at
  * sf0.1, min-of-5). The declarative form runs inside HashAggregateExec
  * whole-stage codegen with a flat (hi: long, lo: long, seen: boolean)
  * buffer. Semantics are IDENTICAL — same fast/slow path results, same
  * 128-bit accumulation, same final conversion:
  *
  *  - per-row micros: fast path `rint(d * 1e6).toLong` under a guard that
  *    PROVES equality with the slow path (see below); slow path = the exact
  *    `BigDecimal.valueOf(d).setScale(6, HALF_UP)` unscaled value via a
  *    static call ([[MoneySumHelper.microsSlow]]), NULL (skip) on
  *    decimal(18,6) overflow — exactly Spark's double→decimal cast
  *    behavior.
  *  - 128-bit add entirely in codegen'd long arithmetic: the unsigned
  *    carry-out of the low-word add is `((a & b) | ((a | b) & ~s)) >>> 63`
  *    (Hacker's Delight); adds are constructed with `EvalMode.LEGACY` so
  *    the intentional two's-complement wrap is wrap, not an ANSI error.
  *  - a NULL-micros row adds (0, 0) — the identity — instead of branching,
  *    and `seen` tracks `isnotnull(micros)` so SUM-over-no-rows stays NULL
  *    and overflow-to-NULL rows don't count as seen (both as before).
  *
  * Fast-path guard: with x = fl(d·1e6) and r = rint(x), the slow path
  * rounds the SHORTEST decimal representation s of d half-up at 6 dp; both
  * |s·1e6 − d·1e6| (half-ulp of d, scaled) and |x − d·1e6| (half-ulp of x)
  * are within ~1.5·ulp(x), so whenever x is further than 4·ulp(x) from a
  * rounding midpoint, s·1e6 lies strictly inside (r−0.5, r+0.5) and rounds
  * to r under any half-rounding rule. The declarative guard uses the
  * static bound |x − r| < 0.42 ∧ |r| < 1e14 (ulp(1.42e14) = 2^-6 = 0.0156,
  * so 0.5 − 4·ulp ≥ 0.4375 > 0.42 over the whole admitted range) — a
  * strict SUBSET of the proven-safe region, so near-midpoint values and
  * large magnitudes take the slow path and stay bit-exact. The guard
  * differs from the imperative form's dynamic `0.5 − 4·ulp(x)` only in
  * WHICH in-agreement values take the fast path — never in the result
  * (MoneySumSpec's midpoint test pins exactly this).
  */
case class MoneySum(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "moneysum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"money_sum expects a double column, got $other")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Per-row unscaled decimal(18,6) micros of `child`, NULL when the input
    * is NULL or overflows the decimal — see the class doc for the guard. */
  private def micros: Expression = {
    val x = Multiply(child, Literal(1e6), EvalMode.LEGACY)
    val r = StaticInvoke(classOf[java.lang.Math], DoubleType, "rint", Seq(x),
      returnNullable = false)
    val fastOk = And(
      LessThan(Abs(Subtract(x, r, EvalMode.LEGACY), failOnError = false),
        Literal(0.42)),
      LessThan(Abs(r, failOnError = false), Literal(1e14)))
    val slow = StaticInvoke(classOf[MoneySumHelper.type], LongType,
      "microsSlow", Seq(child), returnNullable = false)
    val slowOrNull = If(EqualTo(slow, Literal(Long.MinValue)),
      Literal(null, LongType), slow)
    If(IsNull(child), Literal(null, LongType),
      If(fastOk, Cast(r, LongType, None, EvalMode.LEGACY), slowOrNull))
  }

  /** 128-bit (hi, lo) += (addHi, addLo), wrap-safe LEGACY adds. Returns the
    * (newHi, newLo) expression pair. */
  private def add128(curHi: Expression, curLo: Expression,
      addHi: Expression, addLo: Expression): (Expression, Expression) = {
    val newLo = Add(curLo, addLo, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(curLo, addLo),
        BitwiseAnd(BitwiseOr(curLo, addLo), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(curHi, addHi, EvalMode.LEGACY), carry, EvalMode.LEGACY)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val m = micros
    // NULL micros contributes the 128-bit identity (0, 0) — no branch
    val mLo = Coalesce(Seq(m, Literal(0L)))
    val mHi = ShiftRight(mLo, Literal(63)) // sign extension to the high word
    val (newHi, newLo) = add128(hi, lo, mHi, mLo)
    Seq(newHi, newLo, Or(seen, IsNotNull(m)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      StaticInvoke(classOf[MoneySumHelper.type], DoubleType, "evalMoney",
        Seq(hi, lo), returnNullable = false),
      Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Static callees for [[MoneySum]]'s codegen (StaticInvoke). */
object MoneySumHelper {
  /** Exact unscaled decimal(18,6) value of `d` — identical rounding to
    * Spark's Cast(double → decimal(18,6)). Returns Long.MinValue as the
    * "overflows decimal(18,6) → NULL" sentinel (impossible as a real
    * result: |unscaled| < 1e18). */
  def microsSlow(d: Double): Long = {
    val dec = JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)
    if (dec.precision() <= 18) dec.unscaledValue().longValueExact()
    else Long.MinValue
  }

  /** Group-final conversion: the exact decimal the 128-bit accumulator
    * holds, through the same BigDecimal → double rounding as the decimal
    * SUM formulation. Called once per group. */
  def evalMoney(hi: Long, lo: Long): Double = {
    val unscaled = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
    new JBigDecimal(unscaled, 6).doubleValue()
  }
}

object MoneySum {
  /** Column API: exact decimal(18,6) money sum as double. */
  def money_sum(c: Column): Column =
    GraftBridge.toColumn(MoneySum(GraftBridge.toExpression(c)).toAggregateExpression())
}

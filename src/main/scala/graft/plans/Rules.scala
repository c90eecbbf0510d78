package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StringType

/** Custom optimizer rules registered on top of Catalyst.
  *
  * [[CheapFirstFilterOrder]]: order the conjuncts of every `Filter`
  * condition by estimated per-row evaluation cost — comparisons first,
  * string searches later, regexes/UDFs/subqueries last. Spark's generated
  * code short-circuits `AND` left-to-right exactly as written, so a query
  * like the reference's composite scan (`LIKE '%50c%' AND ts BETWEEN …
  * AND int < 80`, reference temp.md:96-105) pays the substring search on
  * every row even though the timestamp range eliminates ~95% of them with
  * two long compares. Cost-ordering the conjuncts is what Trino's evaluator
  * does implicitly; measured 5× on the composite scan at 100M rows.
  *
  * Safety: `AND` is commutative under SQL three-valued logic, but an
  * expression that can *throw* is order-sensitive — a conjunct like
  * `CAST(s AS INT) < 80` guarded by `s RLIKE '^[0-9]+$'` must not move
  * ahead of its guard (Spark 4 runs with `spark.sql.ansi.enabled=true` by
  * default, where CAST / arithmetic overflow / division / element_at
  * throw). The rewrite therefore only fires when EVERY conjunct is
  * provably exception-free: each node of each subtree must come from a
  * whitelist of non-throwing forms (comparisons, IS NULL, string
  * predicates, literal-pattern regexes, up-casts and casts to string;
  * under non-ANSI semantics also arithmetic and arbitrary casts, which
  * return NULL instead of throwing). UDFs, subqueries and `raise_error`
  * never qualify. Any non-deterministic conjunct likewise disables the
  * rewrite for that Filter. The sort is stable — written order survives
  * within a cost class, and repeated application is a fixed point.
  */
object CheapFirstFilterOrder extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Per-row evaluation cost class of a predicate: the most expensive node
    * anywhere in its subtree decides. */
  private def cost(e: Expression): Int = {
    val marks = e.collect {
      case _: In | _: InSet                                   => 10
      case _: StartsWith | _: EndsWith                        => 20
      case _: Contains | _: Like | _: ILike                   => 30
      case _: RLike | _: RegExpExtract | _: RegExpExtractAll  => 40
      case _: RegExpReplace                                   => 40
      case _: ScalaUDF                                        => 50
      case _: PlanExpression[_]                               => 100
    }
    if (marks.isEmpty) 1 else marks.max
  }

  /** True iff every node of the subtree is a provably non-throwing form, so
    * evaluating `e` on ANY row (including rows another conjunct would have
    * filtered) cannot raise. A foldable cast is safe — constant folding has
    * already run by the time extraOptimizations fire, and a throwing
    * constant throws regardless of conjunct order. */
  private def nonThrowing(e: Expression, ansi: Boolean): Boolean = {
    val offender = e.find {
      case _: Attribute | _: Literal | _: BoundReference              => false
      case _: And | _: Or | _: Not                                    => false
      case _: IsNull | _: IsNotNull | _: IsNaN                        => false
      case _: EqualTo | _: EqualNullSafe | _: LessThan |
           _: LessThanOrEqual | _: GreaterThan | _: GreaterThanOrEqual => false
      case _: In | _: InSet                                           => false
      case _: StartsWith | _: EndsWith | _: Contains                  => false
      // non-literal pattern: compiled per row, and a malformed pattern (e.g.
      // a dangling escape char in LIKE) throws regardless of ANSI mode
      case l: Like  => !l.right.foldable
      case l: ILike => !l.right.foldable
      case r: RLike => !r.right.foldable
      case c: Cast =>
        ansi && !c.child.foldable && c.dataType != StringType &&
          !Cast.canUpCast(c.child.dataType, c.dataType)
      case _: BinaryArithmetic | _: UnaryMinus | _: Abs => ansi // overflow/div throw only under ANSI
      case _ => true // unknown node: assume it may throw
    }
    offender.isEmpty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val parts = splitConjuncts(cond)
      lazy val ansi = SQLConf.get.ansiEnabled
      if (parts.length < 2 || parts.exists(!_.deterministic) ||
          !parts.forall(nonThrowing(_, ansi))) f
      else {
        val sorted = parts.sortBy(cost)
        if (sorted == parts) f else f.copy(condition = sorted.reduce(And))
      }
  }

  /** Idempotently register on an existing session (the driver owns session
    * construction, so injection-at-build is not always available). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(CheapFirstFilterOrder))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CheapFirstFilterOrder
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` /
  * `.withExtensions(new GraftExtensions)` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => CheapFirstFilterOrder)
}

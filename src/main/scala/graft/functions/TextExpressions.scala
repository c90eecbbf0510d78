package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-expression layer: set-membership counting over token arrays.
  *
  * `size(filter(tk, t => t.isin(words:_*)))` evaluates interpreted (filter
  * is a higher-order function) and — worse — drags every other expression
  * in its projection out of whole-stage codegen. [[MarkerCounts]] counts
  * membership for ALL marker sets in one pass over the token array and
  * returns the per-set counts; language-ID needs one expression instead of
  * five interpreted array walks, and the winner CASE stays on built-ins.
  * Counts are plain integer equality-membership — identical values to the
  * `isin` formulation, so oracle results are unchanged.
  */
object TextExpressions {

  /** counts(i) = number of tokens contained in markerSets(i). Null tokens
    * are skipped; a NULL array yields NULL. */
  case class MarkerCounts(child: Expression, markerSets: Seq[Seq[String]])
      extends UnaryExpression with Serializable {
    require(markerSets.nonEmpty && markerSets.forall(_.nonEmpty), "empty marker sets")

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"marker_counts expects array<string>, got $other")
    }

    @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
      markerSets.map { ws =>
        val s = new java.util.HashSet[UTF8String](ws.length * 2)
        ws.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray

    def compute(a: ArrayData): ArrayData = {
      val counts = new Array[Int](sets.length)
      val n = a.numElements()
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val t = a.getUTF8String(i)
          var s = 0
          while (s < sets.length) {
            if (sets(s).contains(t)) counts(s) += 1
            s += 1
          }
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(counts)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("markerCounts", this, classOf[MarkerCounts].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API. */
  def marker_counts(tokens: Column, markerSets: Seq[Seq[String]]): Column =
    GraftBridge.toColumn(MarkerCounts(GraftBridge.toExpression(tokens), markerSets))
}

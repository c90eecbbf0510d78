package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expressions for the IVF+PQ batch k-NN join
  * ([[graft.operators.Similarity.knnJoinIvf]]).
  *
  * The join's whole point is that candidates NEVER materialize as a pair
  * stream: each probe row carries its query vector and meets its cell's
  * member directory (one array per cell), and everything per-candidate —
  * PQ shortlist, exact rescore, per-cell top-k — happens inside one scalar
  * expression over that row. The alternatives all re-exchange something
  * candidate-shaped: the LSH path's rank sort carries n·tables·probes·occ
  * rows, and a vector attach to such a stream is the measured 5M×64d wall
  * (broadcast ≥ executor memory, or a ~250 GB SHUFFLE_HASH re-exchange).
  */
object AnnExpressions {

  /** Per-(probe row × cell) top-k: ADC-shortlist the cell's members with the
    * PQ codebook, exact-rescore the shortlist with full vectors, return the
    * k best by (cosine desc, id asc) as an array of (id, cosine) structs.
    *
    * Children: (idA: bigint — excluded from results; vA: array<float>;
    * members: array<struct<id: bigint, norm: double, code: array<int>,
    * v: array<float>>>). The codebook (m × ks × subDim doubles, a few KB at
    * the default m=8/ks=16) rides inside the expression like
    * [[VectorExpressions.NearestCentroid]]'s.
    *
    * Per row: one ADC table build (m·ks·subDim multiplies — cheaper than a
    * single exact member evaluation), then m lookups per member, then
    * `kCand` exact cosines. Asymmetric distance (query side stays a full
    * vector, only the INDEXED side is quantized) dominates symmetric
    * code-to-code scoring at equal cost, which is why the probe row carries
    * vA. Cosine is rounded to 6 dp (HALF_UP) like every scored operator in
    * the engine so ranks reproduce across runs. */
  case class IvfPqCellTopK(
      first: Expression,  // idA
      second: Expression, // vA
      third: Expression,  // members
      k: Int,
      kCand: Int,
      codebooks: Array[Array[Array[Double]]],
      subDim: Int
  ) extends TernaryExpression with Serializable {
    require(k > 0, "need positive k")
    require(kCand >= k, "kCand must be >= k")
    require(codebooks.nonEmpty, "empty PQ codebook")

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("cosine", DoubleType, nullable = false))),
      containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (LongType, ArrayType(FloatType, _), ArrayType(_: StructType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"ivfpq_cell_topk expects (bigint, array<float>, array<struct>), got $other")
      }

    private def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()

    def compute(idA: Long, vAraw: ArrayData, members: ArrayData): ArrayData = {
      val m = codebooks.length
      val dims = vAraw.numElements()
      val vA = new Array[Double](dims)
      var i = 0
      var nrm = 0.0
      while (i < dims) {
        vA(i) = vAraw.getFloat(i).toDouble; nrm += vA(i) * vA(i); i += 1
      }
      val normA = math.sqrt(nrm)
      val nMem = members.numElements()
      if (normA == 0.0 || nMem == 0) return new GenericArrayData(Array.empty[Any])
      // ADC tables: adc(s)(c) = squared L2 of vA's s-th slice to centroid c
      val adc = Array.tabulate(m) { s =>
        val cb = codebooks(s)
        val lo = s * subDim
        Array.tabulate(cb.length) { c =>
          val cent = cb(c)
          var d = 0.0; var j = 0
          val nn = math.min(subDim, math.max(0, dims - lo))
          while (j < nn) { val x = vA(lo + j) - cent(j); d += x * x; j += 1 }
          d
        }
      }
      // shortlist: kCand smallest ADC (ties id asc) by bounded insertion
      val cap = math.min(kCand, nMem)
      val slDist = new Array[Double](cap)
      val slIdx = new Array[Int](cap)
      var filled = 0
      var r = 0
      while (r < nMem) {
        val row = members.getStruct(r, 4)
        val id = row.getLong(0)
        if (id != idA) {
          val code = row.getArray(2)
          var d = 0.0; var s = 0
          val ms = math.min(m, code.numElements())
          while (s < ms) {
            val c = code.getInt(s)
            val t = adc(s)
            if (c >= 0 && c < t.length) d += t(c)
            s += 1
          }
          // insertion position: strictly better than the current worst, or
          // still filling. Tie on distance → lower id wins (stable order).
          if (filled < cap || d < slDist(filled - 1) ||
              (d == slDist(filled - 1) && id < members.getStruct(slIdx(filled - 1), 4).getLong(0))) {
            var p = if (filled < cap) filled else cap - 1
            while (p > 0 && {
                val pd = slDist(p - 1)
                pd > d || (pd == d && members.getStruct(slIdx(p - 1), 4).getLong(0) > id)
              }) {
              slDist(p) = slDist(p - 1); slIdx(p) = slIdx(p - 1); p -= 1
            }
            slDist(p) = d; slIdx(p) = r
            if (filled < cap) filled += 1
          }
        }
        r += 1
      }
      // exact rescore of the shortlist
      val outK = math.min(k, filled)
      val resCos = new Array[Double](filled)
      val resId = new Array[Long](filled)
      var q = 0
      while (q < filled) {
        val row = members.getStruct(slIdx(q), 4)
        val normB = row.getDouble(1)
        val vB = row.getArray(3)
        var dot = 0.0; var j = 0
        val nn = math.min(dims, vB.numElements())
        while (j < nn) { dot += vA(j) * vB.getFloat(j).toDouble; j += 1 }
        resCos(q) = if (normB == 0.0) 0.0 else round6(dot / (normA * normB))
        resId(q) = row.getLong(0)
        q += 1
      }
      val order = (0 until filled).sortBy(q => (-resCos(q), resId(q))).take(outK)
      new GenericArrayData(order.map { q =>
        InternalRow(resId(q), resCos(q)): Any
      }.toArray)
    }

    override def nullSafeEval(a: Any, b: Any, c: Any): Any =
      compute(a.asInstanceOf[Long], b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("ivfPqCellTopK", this, classOf[IvfPqCellTopK].getName)
      nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $self.compute($a, $b, $c);")
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  def ivfpq_cell_topk(idA: Column, vA: Column, members: Column, k: Int,
      kCand: Int, codebooks: Array[Array[Array[Double]]], subDim: Int): Column =
    GraftBridge.toColumn(IvfPqCellTopK(
      GraftBridge.toExpression(idA), GraftBridge.toExpression(vA),
      GraftBridge.toExpression(members), k, kCand, codebooks, subDim))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused product-quantization kernels (Similarity.s8PqAnn). The encode is
  * the corpus-side hot loop — one eval per vector covering all PqM
  * subspaces × up to PqK centroids — and as a chain of higher-order
  * functions it evaluates interpreted per lambda step (~1.5 s at sf0.1 vs
  * ~0.1 s fused; the DotProduct lesson repeated one level up). Both
  * kernels accumulate left-to-right from zero, term-for-term identical to
  * the oracle's sequential list_reduce folds, so codes and ADC sums stay
  * bit-exact across engines.
  */
object PqImpl {
  private def bad(fn: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$fn: $msg")

  /** codes[m] = argmin_j (||c_mj||² − 2·e_m·c_mj), strict-< so the first
    * minimum wins — the same tie rule as list_position(first match) over
    * list_min. Iterates the centroids the codebook actually has (≤ PqK by
    * construction; an empty codebook raises rather than emitting garbage
    * codes).
    */
  def encode(emb: ArrayData, cb: ArrayData, sub: Int): ArrayData = {
    val k = cb.numElements()
    if (k == 0) bad("graft_pq_encode", "empty codebook")
    val dims = emb.numElements()
    if (dims % sub != 0) bad("graft_pq_encode", s"dims $dims not a multiple of subspace width $sub")
    val m = dims / sub
    val cents = new Array[ArrayData](k)
    var j = 0
    while (j < k) {
      if (cb.isNullAt(j)) bad("graft_pq_encode", s"null centroid $j")
      cents(j) = cb.getArray(j)
      if (cents(j).numElements() != dims)
        bad("graft_pq_encode", s"centroid $j has ${cents(j).numElements()} dims, vector has $dims")
      j += 1
    }
    val codes = new Array[Long](m)
    var mm = 0
    while (mm < m) {
      val base = mm * sub
      var bestScore = Double.PositiveInfinity
      var bestJ = 0L
      j = 0
      while (j < k) {
        val c = cents(j)
        var ssq = 0.0
        var dot = 0.0
        var d = 0
        while (d < sub) {
          if (c.isNullAt(base + d) || emb.isNullAt(base + d))
            bad("graft_pq_encode", s"null element at dim ${base + d} " +
              "(vectors and centroids must be null-free)")
          val cd = c.getDouble(base + d); ssq += cd * cd; d += 1
        }
        d = 0
        while (d < sub) { dot += emb.getDouble(base + d) * c.getDouble(base + d); d += 1 }
        val score = ssq - 2.0 * dot
        if (score < bestScore) { bestScore = score; bestJ = j.toLong }
        j += 1
      }
      codes(mm) = bestJ
      mm += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric distance: Σ_m dtab[m][codes[m]], folded in subspace
    * order from 0.0.
    */
  def adc(dtab: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (dtab.numElements() != m)
      bad("graft_pq_adc", s"table has ${dtab.numElements()} subspaces, codes $m")
    var acc = 0.0
    var mm = 0
    while (mm < m) {
      if (dtab.isNullAt(mm) || codes.isNullAt(mm))
        bad("graft_pq_adc", s"null table row or code at subspace $mm")
      val row = dtab.getArray(mm)
      val code = codes.getLong(mm)
      if (code < 0 || code >= row.numElements())
        bad("graft_pq_adc", s"code $code out of range for subspace $mm (${row.numElements()} centroids)")
      if (row.isNullAt(code.toInt))
        bad("graft_pq_adc", s"null distance at subspace $mm, code $code")
      acc += row.getDouble(code.toInt)
      mm += 1
    }
    acc
  }
}

/** PQ codes of a vector against a codebook: array<double> ×
  * array<array<double>> → array<bigint>, `sub` dims per subspace.
  */
case class PqEncode(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> and array<array<double>>, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(e: Any, cb: Any): Any =
    PqImpl.encode(e.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, cb) => s"graft.functions.PqImpl.encode($e, $cb, $sub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  def apply(e: Column, cb: Column, sub: Int): Column =
    GraftShim.column(PqEncode(GraftShim.expression(e), GraftShim.expression(cb), sub))
}

/** ADC lookup-sum: array<array<double>> × array<bigint> → double. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<array<double>> and array<bigint>, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(dtab: Any, codes: Any): Any =
    PqImpl.adc(dtab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, c) => s"graft.functions.PqImpl.adc($d, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(dtab: Column, codes: Column): Column =
    GraftShim.column(PqAdc(GraftShim.expression(dtab), GraftShim.expression(codes)))
}

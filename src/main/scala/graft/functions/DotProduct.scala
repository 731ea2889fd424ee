package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused dot-product kernels. Accumulation is left-to-right from zero —
  * IEEE-identical to the oracle's sequential list_reduce and to the
  * unrolled `(1 to n).map(...).reduce(_ + _)` column trees they replace.
  * A 64-term expression tree inlined into a consumer's codegen can push
  * the generated method past the JIT's compilation limit (see
  * Dedup.d5EmbedDedup); a single call into this loop stays compact.
  *
  * This is a public expression, so the kernels validate what the
  * analyzer can't: a length mismatch or a null element raises instead of
  * silently reading past the shorter array's element region (UnsafeArrayData
  * returns garbage, not an exception, on out-of-range access). The two
  * branches are never-taken on well-formed vectors — free after JIT.
  */
object DotProductImpl {
  private def badLength(fn: String, na: Int, nb: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: array length mismatch ($na vs $nb)")
  private def badNull(fn: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null element at index $i (vectors must be containsNull-free)")

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) badLength("graft_dot", n, b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) badNull("graft_dot", i)
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    acc
  }

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n) badLength("graft_dot_long", n, b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) badNull("graft_dot_long", i)
      acc += a.getLong(i) * b.getLong(i); i += 1
    }
    acc
  }

  /** Both children must be arrays of exactly `elem` (any element
    * nullability — parquet-derived vectors carry containsNull=true in the
    * schema even when the data never contains one; actual nulls raise in
    * the kernel).
    */
  def checkArrayInputs(fn: String, elem: DataType,
                       left: Expression, right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == elem && r == elem =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn requires two array<${elem.catalogString}> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }
}

/** Native dot product of two double arrays (codegen'd, one call site). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    DotProductImpl.checkArrayInputs(prettyName, DoubleType, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProductImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Exact integer dot of two long arrays (s4's quantized candidates). */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def checkInputDataTypes(): TypeCheckResult =
    DotProductImpl.checkArrayInputs(prettyName, LongType, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductImpl.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProductImpl.dotLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(LongDotProduct(GraftShim.expression(a), GraftShim.expression(b)))
}

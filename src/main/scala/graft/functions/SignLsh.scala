package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Unbounded sign-LSH bucketing for the s2 plane bank.
  *
  * Round 10 measured the one scale defect left in the inventory: with the
  * plane count clamped at a compile-time kmax (the old `S2KMax = 8` unroll
  * of gated [[DotProduct]] columns), E[bucket] resumes growing ∝ n once
  * n > 2^kmax · target and s10's exact in-bucket scoring goes quadratic
  * (tier20→tier40 doubling: e ≈ 1.54 CPU). The ceiling existed only
  * because the bucket was a STATIC column unroll — the adaptive rule
  * k = max(kmin, bitLength(n / target)) itself never needed one.
  *
  * This expression removes it: the plane bank is generated on demand from
  * the same LCG the unrolled bank used (coefficient (p, d) =
  * ((1103515245·(p·64+d) + 12345) mod 2³¹) / 2³¹ · 2 − 1, so every bucket
  * at k ≤ 8 is bit-identical to the r7–r10 operators), memoized
  * process-wide, and the kernel loops i < k for WHATEVER k the in-plan
  * count selects. The only remaining bound is the bucket's own datatype:
  * a Long holds 62 usable sign bits, and k = bitLength(n / 256) reaches
  * 55 only at n = 2⁶³ rows — past any corpus a Long row count can
  * address, so the operator carries no scale ceiling at all. Dot
  * accumulation is left-to-right from 0.0, IEEE-identical to the oracle's
  * sequential list_reduce (the oracle text is an unrolled verification
  * artifact; see Similarity.S2OracleK).
  */
object SignLshImpl {
  /** Plane-count cap imposed by the Long bucket type, not by the design:
    * unreachable for any Long-addressable corpus (see scaladoc above).
    */
  val KCap = 62

  /** Legacy LCG coefficient — the exact formula the r7 fixed-k bank used,
    * valid for ANY plane index p (the old code merely materialized
    * p < 8). Dyadic rationals, so oracle decimal literals parse to the
    * bit-identical double.
    */
  def coeff(p: Int, d: Int): Double = {
    val v = (1103515245L * (p * 64L + d) + 12345L) % 2147483648L
    v.toDouble / 2147483648.0 * 2.0 - 1.0
  }

  // grow-only memoized bank; replace-on-grow keeps readers lock-free
  @volatile private var bank: Array[Array[Double]] = Array.empty

  def planesUpTo(k: Int): Array[Array[Double]] = {
    val b = bank
    if (b.length >= k) b
    else synchronized {
      val cur = bank
      if (cur.length >= k) cur
      else {
        val nb = Array.tabulate(k) { p =>
          if (p < cur.length) cur(p)
          else Array.tabulate(64)(d => coeff(p, d))
        }
        bank = nb
        nb
      }
    }
  }

  def bucket(emb: ArrayData, k: Int): Long = {
    if (k < 0 || k > KCap)
      throw new IllegalArgumentException(
        s"graft_sign_lsh: k=$k outside [0, $KCap] (Long bucket bits)")
    val n = emb.numElements()
    if (n != 64)
      throw new IllegalArgumentException(
        s"graft_sign_lsh: expected 64-dim vector, got $n")
    val planes = planesUpTo(k)
    var bkt = 0L
    var i = 0
    while (i < k) {
      val p = planes(i)
      var acc = 0.0
      var d = 0
      while (d < 64) {
        if (emb.isNullAt(d))
          throw new IllegalArgumentException(
            s"graft_sign_lsh: null element at index $d")
        acc += emb.getDouble(d) * p(d)
        d += 1
      }
      if (acc > 0) bkt |= 1L << i
      i += 1
    }
    bkt
  }
}

/** bucket(emb, k): sign bits of emb against the first k LCG planes.
  * Codegen'd as a single static call — 30+ gated DotProduct columns
  * inlined into a consumer's generated method would blow the JIT budget;
  * one fused loop stays compact (the d5 doctrine).
  */
case class SignLshBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_lsh"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, int), got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, k: Any): Any =
    SignLshImpl.bucket(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.SignLshImpl.bucket($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignLshBucket =
    copy(left = newLeft, right = newRight)
}

object SignLshBucket {
  def apply(emb: Column, k: Column): Column =
    GraftShim.column(SignLshBucket(
      GraftShim.expression(emb), GraftShim.expression(k)))
}

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
  * This expression removes it: the plane bank is generated on demand
  * (see [[SignLshImpl.coeff]] — splitmix64 since round 12, which
  * retired the r7–r11 LCG and with it the bit-compat of historical
  * buckets; every gate artifact was regenerated on the new bank),
  * memoized process-wide, and the kernel loops i < k for WHATEVER k the
  * in-plan count selects. The only remaining bound is the bucket's own datatype:
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

  /** Plane coefficient (p, d) — splitmix64-mixed since round 12.
    *
    * The r7–r11 bank sampled a mod-2³¹ LCG at CONSECUTIVE indexes
    * p·64+d, and the lattice correlation across planes (already
    * documented as "visible correlation across 72 planes" when d5's
    * bank chose splitmix64) turned out to be a measured QUALITY defect,
    * not a cosmetic one: correlated plane signs merge what should be
    * independent cuts, producing mega-buckets of UNRELATED vectors
    * (tier80: max |bucket| 3297 on this bank vs 880 on d5's splitmix
    * bank over the same corpus — PROBE_BUCKETS.json), and in those
    * buckets the band rule's "truncation only sacrifices near-ties"
    * assumption fails badly (BAND_RECALL.json pre-fix: s10 banded
    * recall@3 = 0.79 at tier80 with max cosine regret ≈ 0.40).
    * splitmix64 makes the planes effectively independent, so the skew
    * tail is genuine near-dup clusters — the shape the band rule is
    * designed for. The seed rides in a namespace disjoint from d5's
    * bank (embPlaneId·64+d < 2²⁰) so the two banks can never alias.
    * Dyadic rationals, so oracle decimal literals parse to the
    * bit-identical double.
    */
  val SeedBase = 0x53320000000L // 's2' namespace, disjoint from d5's < 2^20

  def coeff(p: Int, d: Int): Double = {
    var z = SeedBase + p * 64L + d + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
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

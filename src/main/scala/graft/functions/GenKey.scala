package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the ring hash: little-endian u32 of the first four
  * MD5 digest bytes (hash_ring.py:18-24 semantics). One digest per call,
  * thread-local MessageDigest — no hex-string round trip like the
  * md5()/conv()/substring() composition needs.
  */
object GenKeyImpl {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def genKey(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(3) & 0xffL) << 24) | ((b(2) & 0xffL) << 16) |
      ((b(1) & 0xffL) << 8) | (b(0) & 0xffL)
  }
}

/** Native Catalyst expression for the ring hash key. Equivalent to the
  * composed form HashRing.sparkGenKey (and the DuckDB oracle), ~3x faster
  * per row, and stays inside whole-stage codegen.
  */
case class GenKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_gen_key"

  override protected def nullSafeEval(input: Any): Any =
    GenKeyImpl.genKey(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GenKeyImpl.genKey($c)")

  override protected def withNewChildInternal(newChild: Expression): GenKey =
    copy(child = newChild)
}

object GenKey {
  def apply(c: Column): Column = GraftShim.column(GenKey(GraftShim.expression(c)))
}

/** Adjacent-bigram ring-hash fingerprints of a token array:
  * out[i] = genKey(toks[i] + " " + toks[i+1]). One codegen'd call per
  * ROW where the HOF formulation (transform + the composed md5/conv
  * ring hash) evaluated interpreted per bigram — the t4
  * RollingFingerprint lesson applied to st10's stream-boundary quality
  * gate, whose dup-bigram count must use THE SAME u32 bigram keys as
  * t7/t8 so a (vanishingly rare) in-doc hash collision biases stream
  * and batch identically. Equivalence to the composed form holds for
  * arrays of >= 2 tokens; below that this kernel returns the EMPTY
  * array (the useful semantics) where the composed
  * transform(sequence(0, size-2), ...) form degenerates — Spark's
  * sequence(0, -1) descends to [0, -1] and the lambda emits nulls —
  * so callers on unguarded short docs must use this kernel, not the
  * HOF.
  */
object BigramKeysImpl {
  private val Space = UTF8String.fromString(" ")

  def keys(toks: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val out = new Array[Long](n - 1)
    var i = 0
    while (i < n - 1) {
      if (toks.isNullAt(i) || toks.isNullAt(i + 1))
        throw new IllegalArgumentException(
          "graft_bigram_keys: null token at index " +
            s"${if (toks.isNullAt(i)) i else i + 1} (token arrays must be null-free)")
      out(i) = GenKeyImpl.genKey(UTF8String.concat(
        toks.getUTF8String(i), Space, toks.getUTF8String(i + 1)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class BigramKeys(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bigram_keys"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${t.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    BigramKeysImpl.keys(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramKeysImpl.keys($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramKeys =
    copy(child = newChild)
}

object BigramKeys {
  def apply(c: Column): Column =
    GraftShim.column(BigramKeys(GraftShim.expression(c)))
}

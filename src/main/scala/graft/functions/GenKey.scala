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

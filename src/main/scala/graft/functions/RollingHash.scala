package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint of a string's code points:
  * fold-left (acc·31 + cp) mod 1e9+7 — the t4 contract.
  *
  * Replaces the `aggregate(sequence(1, length(text)), ...)` higher-order
  * form: a HOF lambda evaluates through interpreted expression machinery
  * once per ELEMENT per row (the round-5 d9 lesson — allowed for plain
  * expressions, but a per-character interpreted loop all the same), plus
  * the sequence() array materializes length(text) integers per row. This
  * is one codegen'd static call over the string — no per-element
  * machinery, no scratch array — with identical semantics: Spark's
  * length()/substring() count code points, Spark 4's ascii() returns the
  * CODE POINT of a multibyte first char (verified empirically:
  * ascii('é') = 233, not the signed first UTF-8 byte), and DuckDB's
  * text[i]/ascii() are code-point-based too, so the fold visits the same
  * units with the same values on every engine, ASCII or not.
  */
object RollingHashImpl {
  val Mod = 1000000007L

  def fingerprint(s: UTF8String): Long = {
    // fast path: pure-ASCII payloads fold over the UTF8 bytes directly
    // (code point == byte), zero allocation; any non-ASCII byte falls
    // back to the code-point walk over a decoded String
    val nBytes = s.numBytes
    var acc = 0L
    var i = 0
    while (i < nBytes) {
      val b = s.getByte(i)
      if (b < 0) return fingerprintCodePoints(s)
      acc = (acc * 31 + b) % Mod
      i += 1
    }
    acc
  }

  private def fingerprintCodePoints(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fingerprint"

  /** SQL-exposed (GraftExtensions), so the analyzer must reject non-string
    * inputs at plan time — without this a BIGINT argument passes analysis
    * and dies executor-side in codegen/eval (the DotProduct doctrine).
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fingerprint needs STRING, got ${child.dataType.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingHashImpl.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashImpl.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  def apply(c: Column): Column =
    GraftShim.column(RollingFingerprint(GraftShim.expression(c)))
}

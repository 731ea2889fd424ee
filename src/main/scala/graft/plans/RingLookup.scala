package graft.plans

import graft.arrays.HashRing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable, immutable ring table: sorted vnode keys + owning nodes.
  * Built once driver-side from a [[HashRing]], shipped in the expression
  * (a few KB), shared by every task.
  */
final class RingTable(ring: HashRing) extends Serializable {
  // ring.canonical is the single source of truth for key -> node (one
  // entry per key, duplicate ring keys already resolved last-wins), so
  // this table and driver-side HashRing.getNode can never disagree
  private val entries: Array[(Long, String)] = ring.canonical.toArray
  private val keys: Array[Long] = entries.map(_._1)
  private val nodes: Array[UTF8String] =
    entries.map(e => UTF8String.fromString(e._2))

  /** Successor-strictly-greater binary search, wrapping to the first key —
    * bisect semantics of the reference (hash_ring.py:79-97), O(log n) per
    * row vs the O(n) scan a filter+array_min expression would do.
    */
  def lookup(h: Long): UTF8String = {
    var idx = java.util.Arrays.binarySearch(keys, h)
    if (idx >= 0) idx += 1 // exact hit: successor is strictly greater
    else idx = -idx - 1 // insertion point = first key > h
    nodes(if (idx >= keys.length) 0 else idx)
  }
}

/** Native Catalyst expression: consistent-hash ring placement of a 32-bit
  * ring position (see HashRing.sparkGenKey). Stays inside whole-stage
  * codegen — the generated code calls straight into [[RingTable.lookup]]
  * with a primitive long, no boxing, no virtual dispatch through lambda
  * interpreters. This is the preference-order-(b) path from SURVEY §2:
  * a custom Expression where composing built-ins would be asymptotically
  * worse (O(ring) per row at 10^9 arrays).
  */
case class RingLookup(child: Expression, table: RingTable)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "ring_lookup"

  override protected def nullSafeEval(input: Any): Any =
    table.lookup(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ringTable", table, classOf[RingTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.lookup($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RingLookup =
    copy(child = newChild)
}

object RingLookup {
  /** Column API: `place = RingLookup.place(hashCol, ring)`. */
  def place(hash: Column, ring: HashRing): Column =
    GraftShim.column(
      RingLookup(GraftShim.expression(hash), new RingTable(ring)))
}

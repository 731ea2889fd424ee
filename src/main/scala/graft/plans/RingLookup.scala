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

  /** Failover preference list: the first `k` DISTINCT nodes walking
    * clockwise from `h` (the owner first, then the nodes a client falls
    * back to when the owner is unreachable — the deterministic form of
    * utils/requests.py's retry-across-nodes read path, and the classic
    * ketama replica set).
    */
  def replicasData(h: Long, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    var idx = java.util.Arrays.binarySearch(keys, h)
    if (idx >= 0) idx += 1 else idx = -idx - 1
    val start = if (idx >= keys.length) 0 else idx
    val out = new java.util.ArrayList[UTF8String](k)
    var steps = 0
    while (out.size < k && steps < keys.length) {
      val n = nodes((start + steps) % keys.length)
      if (!out.contains(n)) out.add(n)
      steps += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[UTF8String](out.size)).asInstanceOf[Array[Any]])
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

/** Native expression: the ordered k-node failover preference list for a
  * ring position (see [[RingTable.replicasData]]). Codegen'd like
  * [[RingLookup]]; returns array<string> of the first k distinct nodes
  * clockwise.
  */
case class RingReplicas(child: Expression, table: RingTable, k: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ring_replicas"

  override protected def nullSafeEval(input: Any): Any =
    table.replicasData(input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ringTable", table, classOf[RingTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.replicasData($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): RingReplicas =
    copy(child = newChild)
}

object RingReplicas {
  def replicas(hash: Column, ring: HashRing, k: Int): Column =
    GraftShim.column(
      RingReplicas(GraftShim.expression(hash), new RingTable(ring), k))
}

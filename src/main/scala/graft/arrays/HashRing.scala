package graft.arrays

import java.security.MessageDigest

/** Ketama-style consistent hash ring, semantically equivalent to the
  * reference implementation (deker_server_adapters/hash_ring.py:15-143):
  * MD5 digest, `floor(40·N·w/Σw)` vnodes per node, 3 ring keys per vnode
  * (one per 4-byte chunk of the digest), successor-strictly-greater lookup
  * wrapping to the smallest key (hash_ring.py:79-97 bisect semantics).
  *
  * The ring itself is tiny (120·N keys) and built driver-side; *placement*
  * of billions of arrays is a pure column expression against the broadcast
  * ring (see [[ArrayOps.a11HashringPlace]]) — embarrassingly parallel, no
  * shuffle, which is the 100 TB story the reference's per-request Python
  * lookup cannot tell.
  */
final class HashRing(nodes: Seq[String], weights: Map[String, Int] = Map.empty) {

  /** Unsigned bytes of the MD5 digest (hash_ring.py:21-24). */
  private def digest(key: String): Array[Int] =
    MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(_ & 0xff)

  /** Little-endian u32 from 4 digest bytes at `off` (hash_ring.py:18-19). */
  private def hashVal(b: Array[Int], off: Int): Long =
    (b(3 + off).toLong << 24) | (b(2 + off).toLong << 16) |
      (b(1 + off).toLong << 8) | b(off).toLong

  /** Ring position of an arbitrary string key (hash_ring.py:135-143).
    * Delegates to the executor-side kernel so driver lookup and the
    * GenKey expression can never drift apart.
    */
  def genKey(key: String): Long =
    graft.functions.GenKeyImpl.genKey(
      org.apache.spark.unsafe.types.UTF8String.fromString(key))

  /** (ringKey, node) pairs — the generated circle (hash_ring.py:26-48). */
  val ring: Seq[(Long, String)] = {
    val totalWeight = nodes.map(n => weights.getOrElse(n, 1)).sum
    nodes.flatMap { node =>
      val w = weights.getOrElse(node, 1)
      val factor = math.floor(40.0 * nodes.length * w / totalWeight).toInt
      (0 until factor).flatMap { j =>
        val b = digest(s"$node-$j")
        (0 until 3).map(i => (hashVal(b, i * 4), node))
      }
    }
  }

  /** Canonical (key, node) resolution, sorted by key, one entry per key:
    * on a duplicate 32-bit ring key the LAST generated entry wins — the
    * reference's dict-assignment semantics (hash_ring.py `ring[key] =
    * node`). Every lookup structure — driver [[getNode]], the executor
    * RingTable, and the DuckDB oracle VALUES list — is built from this one
    * sequence, so a collision can never make them disagree (and the
    * oracle's scalar subquery can never see two rows for one key).
    */
  val canonical: Seq[(Long, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    ring.foreach { case (k, n) => m(k) = n }
    m.toSeq.sortBy(_._1)
  }

  val sortedKeys: Seq[Long] = canonical.map(_._1)
  private val byKey: Map[Long, String] = canonical.toMap

  /** Successor-strictly-greater lookup, wrapping to the first key. */
  def getNode(stringKey: String): String = {
    val h = genKey(stringKey)
    val pos = sortedKeys.indexWhere(_ > h)
    byKey(if (pos < 0) sortedKeys.head else sortedKeys(pos))
  }

  /** SQL fragment: the canonical ring as a VALUES list for the oracle. */
  def sqlValues: String =
    canonical.map { case (k, n) => s"($k, '$n')" }.mkString(", ")
}

object HashRing {
  /** The cluster modeled in §2-A: three weighted nodes, and a target
    * topology with a fourth node for the rebalance diff (a12), mirroring
    * cluster_config.py current/target rings.
    */
  val currentNodes: Seq[String] = Seq("node-a", "node-b", "node-c")
  val targetNodes: Seq[String] = Seq("node-a", "node-b", "node-c", "node-d")
  val nodeWeights: Map[String, Int] = Map("node-c" -> 2)

  lazy val current: HashRing = new HashRing(currentNodes, nodeWeights)
  lazy val target: HashRing = new HashRing(targetNodes, nodeWeights)

  /** Spark SQL expression computing `genKey` of a string column `expr`:
    * little-endian u32 of the first 4 MD5 bytes — identical to the Scala
    * and DuckDB forms. Kept as native functions (md5/conv/substring) so it
    * stays inside whole-stage codegen.
    */
  def sparkGenKey(expr: String): String =
    s"CAST(conv(concat(substring(md5($expr), 7, 2), substring(md5($expr), 5, 2), " +
      s"substring(md5($expr), 3, 2), substring(md5($expr), 1, 2)), 16, 10) AS BIGINT)"

  /** DuckDB equivalent of [[sparkGenKey]]. */
  def duckGenKey(expr: String): String =
    s"('0x' || substr(md5($expr), 7, 2) || substr(md5($expr), 5, 2) || " +
      s"substr(md5($expr), 3, 2) || substr(md5($expr), 1, 2))::BIGINT"
}

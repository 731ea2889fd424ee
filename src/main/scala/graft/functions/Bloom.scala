package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Deterministic Bloom filter over u32 ring-hash fingerprints.
  *
  * The scale fix for broadcast-set membership (d9's decontamination
  * gate): an exact benchmark shingle set grows with the benchmark
  * (hundreds of MB at production benchmark suites), while the Bloom
  * bitset is a fixed NumBits regardless — the corpus-side probe stays a
  * map-side filter on an 8 KB broadcast value, and only bloom-positive
  * rows (true overlap + the engineered false-positive rate) reach the
  * exact verification join.
  *
  * Everything is integer arithmetic on the already-u32 fingerprint
  * ([[GenKeyImpl]]), so the k probe positions are bit-reproducible on any
  * engine and the oracle can mirror the filter relationally (position
  * membership against the union of benchmark positions — the exact
  * semantics a bitset stores).
  */
object BloomImpl {
  val NumBits = 65536
  val NumWords: Int = NumBits / 64
  val K = 4
  val P = 1000000007L
  /** Same LCG family as the MinHash permutations (a odd, < 2^30):
    * a*h + b < 2^30 * 2^32 < 2^63 — overflow-free on both engines.
    */
  val hashA: IndexedSeq[Long] = (0 until K).map(j => (((j + 1) * 2654435761L) % P) | 1L)
  val hashB: IndexedSeq[Long] = (0 until K).map(j => ((j + 1) * 40503L * 65537L + 12345L) % P)

  /** floorMod, not %: the probe expression accepts ANY LongType column —
    * a negative input under plain % would yield a negative position and
    * index out of bounds. For the u32 fingerprints the operators feed it
    * (GenKey ∈ [0, 2^32)) the two are identical, so the oracle's plain %
    * stays bit-exact.
    */
  def position(j: Int, h: Long): Int =
    Math.floorMod(Math.floorMod(hashA(j) * h + hashB(j), P), NumBits).toInt

  def setBits(words: Array[Long], h: Long): Unit = {
    var j = 0
    while (j < K) {
      val p = position(j, h)
      words(p >> 6) |= (1L << (p & 63))
      j += 1
    }
  }

  /** Little-endian word serialization: bit p lands at byte p>>3, bit p&7 —
    * the layout [[mightContain]] probes without deserializing.
    */
  def serialize(words: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](words.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bytes
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(words)
    words
  }

  /** Probe directly on the serialized bytes (the form the probe sees after
    * the 1-row broadcast join) — no per-row copy.
    */
  def mightContain(bytes: Array[Byte], h: Long): Boolean = {
    var j = 0
    while (j < K) {
      val p = position(j, h)
      if ((bytes(p >> 3) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }
}

/** Builds the serialized Bloom bitset over a LongType fingerprint column.
  * A TypedImperativeAggregate (the same machinery as Spark's own
  * BloomFilterAggregate): the buffer is the raw word array, update sets K
  * bits, merge ORs — both partial-aggregated map-side, so the shuffle
  * carries NumWords longs per partition, not per row.
  */
case class BloomBuildAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  /** Analysis-time rejection, mirroring [[BloomMightContain]]: without it
    * a non-LongType child passes analysis and dies executor-side with a
    * ClassCastException in update's asInstanceOf — the aggregate is a
    * public Column-level API even though it is not SQL-registered.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build needs a BIGINT fingerprint column, " +
        s"got ${child.dataType.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomImpl.NumWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.setBits(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomImpl.serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomImpl.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

object BloomBuildAgg {
  def apply(c: Column): Column =
    GraftShim.column(BloomBuildAgg(GraftShim.expression(c)).toAggregateExpression())
}

/** Codegen'd membership probe on the serialized bitset: stays inside
  * whole-stage codegen as a static call, like [[GenKey]].
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs (BINARY, BIGINT), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(bloom: Any, h: Any): Any =
    BloomImpl.mightContain(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomImpl.mightContain($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  def apply(bloom: Column, h: Column): Column =
    GraftShim.column(BloomMightContain(
      GraftShim.expression(bloom), GraftShim.expression(h)))
}

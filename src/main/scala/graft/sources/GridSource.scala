package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2: a dense n-dimensional coordinate grid tiled on a vgrid —
  * the reference's VArray layout (varray_adapter.py, `v_position` is an
  * n-tuple) as a first-class Spark source.
  *
  * Each vgrid tile is one `InputPartition`, so Deker's unit of physical
  * placement maps 1:1 onto Spark's unit of parallelism, and bounds filters
  * on the dim-index columns are pushed down (`SupportsPushDownFilters`) to
  * *prune whole tiles before any task launches* — the plan-time analogue
  * of the server only contacting nodes that own requested tiles. Rows are
  * generated, not stored: a dense `read_data` subset is this source
  * LEFT-joined with the sparse cell table (ArrayOps.a14DenseRead 2-D,
  * a31DenseRead3d 3-D).
  *
  * Options: `dims` (dimension count, default 2), then per dim k:
  * d{k} (grid extent), t{k} (tile extent), s{k} (slice step, default 1)
  * anchored at a{k} (the request's lo, default 0) — the dense form of
  * `arr[lo:hi:step, ...]` (slice_converter, base.py:236). A stride is
  * applied at the source: tiles whose range contains no stride-aligned
  * index are pruned with the same plan-time mechanism as bounds, and
  * readers step directly (no generate-then-filter).
  * Schema: (i0..i{n-1}, v0..v{n-1}) — global coords + owning tile coords.
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.schemaFor(GridSource.dimCount(options.get("dims")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    def opt(k: String, d: Long): Long =
      Option(properties.get(k)).map { v =>
        try v.toLong catch {
          case _: NumberFormatException =>
            // keep the typed error surface: callers catch GraftException,
            // not a bare NumberFormatException from the option parser
            throw new graft.GraftBoundsError(
              s"grid option $k must be an integer: got '$v'")
        }
      }.getOrElse(d)
    val n = GridSource.dimCount(properties.get("dims"))
    // validate at table-resolution time, same contract as ArrayOps' slice
    // entry points: step 0 would divide-by-zero in align() at plan time,
    // a negative step would make the reader's stepping loop never reach
    // its bound (unbounded row emission); a non-positive tile extent would
    // divide-by-zero in tile enumeration.
    val dims = (0 until n).map { k =>
      val s = opt(s"s$k", 1)
      graft.Errors.requireStep(s)
      val t = opt(s"t$k", if (k == 0) 10 else 16)
      if (t < 1)
        throw new graft.GraftBoundsError(s"tile extents must be >= 1: got $t for dim $k")
      GridDim(opt(s"d$k", if (k == 0) 32 else 16), t, s, opt(s"a$k", 0))
    }.toArray
    new GridTable(dims)
  }
}

/** Static shape of one grid dimension: extent, tile extent, step, anchor. */
case class GridDim(d: Long, t: Long, s: Long, a: Long)

object GridSource {
  def dimCount(v: String): Int = {
    val n = Option(v).map { raw =>
      try raw.toInt catch {
        case _: NumberFormatException =>
          throw new graft.GraftBoundsError(s"grid option dims must be an integer: got '$raw'")
      }
    }.getOrElse(2)
    if (n < 1 || n > 8)
      throw new graft.GraftBoundsError(s"grid dims must be in [1, 8]: got $n")
    n
  }

  def schemaFor(n: Int): StructType = StructType(
    (0 until n).map(k => StructField(s"i$k", LongType, nullable = false)) ++
      (0 until n).map(k => StructField(s"v$k", LongType, nullable = false)))
}

final class GridTable(dims: Array[GridDim]) extends Table with SupportsRead {
  override def name(): String =
    s"grid(${dims.map(_.d).mkString("x")}, tile ${dims.map(_.t).mkString("x")}, " +
      s"step ${dims.map(_.s).mkString("x")})"
  override def schema(): StructType = GridSource.schemaFor(dims.length)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(dims)
}

/** Accepts i{k} range filters; everything else stays with Spark. */
final class GridScanBuilder(dims: Array[GridDim])
    extends ScanBuilder with SupportsPushDownFilters {

  // bounds as [lo, hi) per dim, tightened by every accepted filter
  private val lo = Array.fill(dims.length)(0L)
  private val hi = dims.map(_.d)
  private var pushed: Array[Filter] = Array.empty

  /** i{k} attribute name -> dim index, for this table's dims only. */
  private def dimOf(attr: String): Int =
    if (attr.length >= 2 && attr.charAt(0) == 'i' && attr.drop(1).forall(_.isDigit)) {
      val k = attr.drop(1).toInt
      if (k < dims.length) k else -1
    } else -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual(a, _: Long) => dimOf(a) >= 0
      case GreaterThan(a, _: Long) => dimOf(a) >= 0
      case LessThan(a, _: Long) => dimOf(a) >= 0
      case LessThanOrEqual(a, _: Long) => dimOf(a) >= 0
      case EqualTo(a, _: Long) => dimOf(a) >= 0
      case _ => false
    }
    // saturating +1s: v = Long.MaxValue must not wrap (an accepted filter
    // is applied exactly — a wrap would return wrong rows, not just lose
    // an optimization)
    def incl(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    accepted.foreach {
      case GreaterThanOrEqual(a, v: Long) =>
        val k = dimOf(a); lo(k) = math.max(lo(k), v)
      case GreaterThan(a, v: Long) =>
        val k = dimOf(a)
        if (v == Long.MaxValue) hi(k) = lo(k) else lo(k) = math.max(lo(k), v + 1)
      case LessThan(a, v: Long) =>
        val k = dimOf(a); hi(k) = math.min(hi(k), v)
      case LessThanOrEqual(a, v: Long) =>
        val k = dimOf(a); hi(k) = math.min(hi(k), incl(v))
      case EqualTo(a, v: Long) =>
        val k = dimOf(a); lo(k) = math.max(lo(k), v); hi(k) = math.min(hi(k), incl(v))
      case _ => ()
    }
    pushed = accepted
    // the source applies range filters exactly; nothing residual from them
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GridScan(dims, lo.clone(), hi.clone())
}

final class GridScan(dims: Array[GridDim], lo: Array[Long], hi: Array[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = GridSource.schemaFor(dims.length)
  override def toBatch: Batch = this

  /** First index >= lo congruent to anchor mod step. */
  private def align(lo: Long, anchor: Long, step: Long): Long =
    lo + (((anchor - lo) % step) + step) % step

  /** One InputPartition per vgrid tile containing at least one
    * stride-aligned in-bounds index along EVERY dim — bounds AND stride
    * prune tiles here, at plan time, and readers step directly (never
    * generate-then-drop). Tiles enumerate as the cartesian product of the
    * per-dim intersecting tile ranges (an odometer over dims).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = dims.length
    if ((0 until n).exists(k => lo(k) >= hi(k))) return Array.empty
    // per dim: the list of (v, start, end) tile segments that survive
    // bounds + stride pruning
    val segs: Array[Array[(Long, Long, Long)]] = Array.tabulate(n) { k =>
      val GridDim(_, t, s, a) = dims(k)
      ((lo(k) / t) to ((hi(k) - 1) / t)).iterator.flatMap { tv =>
        val start = align(math.max(lo(k), tv * t), a, s)
        val end = math.min(hi(k), (tv + 1) * t)
        if (start < end) Iterator.single((tv, start, end)) else Iterator.empty
      }.toArray
    }
    if (segs.exists(_.isEmpty)) return Array.empty
    val out = Array.newBuilder[InputPartition]
    val idx = new Array[Int](n)
    var done = false
    while (!done) {
      val chosen = Array.tabulate(n)(k => segs(k)(idx(k)))
      out += GridTilePartition(
        chosen.map(_._1), chosen.map(_._2), chosen.map(_._3), dims.map(_.s))
      // odometer increment, most-significant dim first for a stable order
      var k = n - 1
      var carry = true
      while (carry && k >= 0) {
        idx(k) += 1
        if (idx(k) < segs(k).length) carry = false
        else { idx(k) = 0; k -= 1 }
      }
      done = carry
    }
    out.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory
}

/** One tile: per-dim tile coord, aligned [lo, hi) within the tile, step. */
case class GridTilePartition(v: Array[Long], lo: Array[Long], hi: Array[Long],
                             s: Array[Long]) extends InputPartition

final class GridReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val t = p.asInstanceOf[GridTilePartition]
    val n = t.v.length
    new PartitionReader[InternalRow] {
      // odometer over the tile's aligned lattice; last dim fastest
      private val i = t.lo.clone()
      private var first = true
      override def next(): Boolean = {
        if (first) { first = false; return true } // lo < hi per dim by construction
        var k = n - 1
        while (k >= 0) {
          i(k) += t.s(k)
          if (i(k) < t.hi(k)) return true
          i(k) = t.lo(k); k -= 1
        }
        false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq((0 until n).map(i(_)) ++ (0 until n).map(t.v(_)))
      override def close(): Unit = ()
    }
  }
}

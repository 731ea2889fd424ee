package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2: a dense 2-D coordinate grid tiled on a vgrid — the
  * reference's VArray layout (varray_adapter.py, `v_position`) as a
  * first-class Spark source.
  *
  * Each vgrid tile is one `InputPartition`, so Deker's unit of physical
  * placement maps 1:1 onto Spark's unit of parallelism, and bounds filters
  * on the dim-index columns are pushed down (`SupportsPushDownFilters`) to
  * *prune whole tiles before any task launches* — the plan-time analogue
  * of the server only contacting nodes that own requested tiles. Rows are
  * generated, not stored: a dense `read_data` subset is this source
  * LEFT-joined with the sparse cell table (ArrayOps.a14DenseRead).
  *
  * Options: d0, d1 (grid extents), t0, t1 (tile extents), s0, s1 (slice
  * steps, default 1) anchored at a0, a1 (the request's lo per dim, default
  * 0) — the dense form of `arr[lo:hi:step]` (slice_converter, base.py:236).
  * A stride is applied at the source: tiles whose range contains no
  * stride-aligned index are pruned with the same plan-time mechanism as
  * bounds, and readers step directly (no generate-then-filter).
  * Schema: (i0, i1, v0, v1) — global coords + owning tile coords.
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.schema

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
    // validate at table-resolution time, same contract as ArrayOps' slice
    // entry points: step 0 would divide-by-zero in align() at plan time,
    // a negative step would make the reader's stepping loop never reach
    // its bound (unbounded row emission); a non-positive tile extent would
    // divide-by-zero in tile enumeration.
    val (s0, s1) = (opt("s0", 1), opt("s1", 1))
    graft.Errors.requireStep(s0); graft.Errors.requireStep(s1)
    val (t0, t1) = (opt("t0", 10), opt("t1", 16))
    if (t0 < 1 || t1 < 1)
      throw new graft.GraftBoundsError(s"tile extents must be >= 1: got ($t0, $t1)")
    new GridTable(opt("d0", 32), opt("d1", 16), t0, t1,
      s0, s1, opt("a0", 0), opt("a1", 0))
  }
}

object GridSource {
  val schema: StructType = StructType(Seq(
    StructField("i0", LongType, nullable = false),
    StructField("i1", LongType, nullable = false),
    StructField("v0", LongType, nullable = false),
    StructField("v1", LongType, nullable = false)))
}

final class GridTable(d0: Long, d1: Long, t0: Long, t1: Long,
                      s0: Long, s1: Long, a0: Long, a1: Long)
    extends Table with SupportsRead {
  override def name(): String = s"grid(${d0}x$d1, tile ${t0}x$t1, step ${s0}x$s1)"
  override def schema(): StructType = GridSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(d0, d1, t0, t1, s0, s1, a0, a1)
}

/** Accepts i0/i1 range filters; everything else stays with Spark. */
final class GridScanBuilder(d0: Long, d1: Long, t0: Long, t1: Long,
                            s0: Long, s1: Long, a0: Long, a1: Long)
    extends ScanBuilder with SupportsPushDownFilters {

  // bounds as [lo, hi) per dim, tightened by every accepted filter
  private var lo0 = 0L; private var hi0 = d0
  private var lo1 = 0L; private var hi1 = d1
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("i0" | "i1", _: Long) => true
      case GreaterThan("i0" | "i1", _: Long) => true
      case LessThan("i0" | "i1", _: Long) => true
      case LessThanOrEqual("i0" | "i1", _: Long) => true
      case EqualTo("i0" | "i1", _: Long) => true
      case _ => false
    }
    // saturating +1s: v = Long.MaxValue must not wrap (an accepted filter
    // is applied exactly — a wrap would return wrong rows, not just lose
    // an optimization)
    def incl(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    accepted.foreach {
      case GreaterThanOrEqual("i0", v: Long) => lo0 = math.max(lo0, v)
      case GreaterThan("i0", v: Long)        => if (v == Long.MaxValue) hi0 = lo0 else lo0 = math.max(lo0, v + 1)
      case LessThan("i0", v: Long)           => hi0 = math.min(hi0, v)
      case LessThanOrEqual("i0", v: Long)    => hi0 = math.min(hi0, incl(v))
      case EqualTo("i0", v: Long)            => lo0 = math.max(lo0, v); hi0 = math.min(hi0, incl(v))
      case GreaterThanOrEqual("i1", v: Long) => lo1 = math.max(lo1, v)
      case GreaterThan("i1", v: Long)        => if (v == Long.MaxValue) hi1 = lo1 else lo1 = math.max(lo1, v + 1)
      case LessThan("i1", v: Long)           => hi1 = math.min(hi1, v)
      case LessThanOrEqual("i1", v: Long)    => hi1 = math.min(hi1, incl(v))
      case EqualTo("i1", v: Long)            => lo1 = math.max(lo1, v); hi1 = math.min(hi1, incl(v))
      case _ => ()
    }
    pushed = accepted
    // the source applies range filters exactly; nothing residual from them
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GridScan(lo0, hi0, lo1, hi1, t0, t1, s0, s1, a0, a1)
}

final class GridScan(lo0: Long, hi0: Long, lo1: Long, hi1: Long,
                     t0: Long, t1: Long, s0: Long, s1: Long,
                     a0: Long, a1: Long) extends Scan with Batch {
  override def readSchema(): StructType = GridSource.schema
  override def toBatch: Batch = this

  /** First index >= lo congruent to anchor mod step. */
  private def align(lo: Long, anchor: Long, step: Long): Long =
    lo + (((anchor - lo) % step) + step) % step

  /** One InputPartition per vgrid tile containing at least one
    * stride-aligned in-bounds index — bounds AND stride prune tiles here,
    * at plan time, and readers step directly (never generate-then-drop).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (lo0 >= hi0 || lo1 >= hi1) return Array.empty
    val tiles = for {
      tv0 <- (lo0 / t0) to ((hi0 - 1) / t0)
      tv1 <- (lo1 / t1) to ((hi1 - 1) / t1)
      start0 = align(math.max(lo0, tv0 * t0), a0, s0)
      end0 = math.min(hi0, (tv0 + 1) * t0)
      start1 = align(math.max(lo1, tv1 * t1), a1, s1)
      end1 = math.min(hi1, (tv1 + 1) * t1)
      if start0 < end0 && start1 < end1
    } yield GridTilePartition(tv0, tv1, start0, end0, s0, start1, end1, s1)
    tiles.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory
}

case class GridTilePartition(v0: Long, v1: Long,
                             lo0: Long, hi0: Long, s0: Long,
                             lo1: Long, hi1: Long, s1: Long) extends InputPartition

final class GridReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val t = p.asInstanceOf[GridTilePartition]
    new PartitionReader[InternalRow] {
      private var i0 = t.lo0
      private var i1 = t.lo1 - t.s1
      override def next(): Boolean = {
        i1 += t.s1
        if (i1 >= t.hi1) { i1 = t.lo1; i0 += t.s0 }
        i0 < t.hi0
      }
      override def get(): InternalRow =
        InternalRow(i0, i1, t.v0, t.v1)
      override def close(): Unit = ()
    }
  }
}

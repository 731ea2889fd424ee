package graft.arrays

import graft.{Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2-A: the reference's array-adapter surface re-expressed as Spark
  * operators over the long-form cell model. Each operator cites the
  * reference behavior it matches (file:line in /root/reference).
  */
object ArrayOps {
  import ArrayModel._

  // --- a1_grid_build: materialize the collection (base.py:111 create) -----
  def a1GridBuild(s: SparkSession, dir: String): DataFrame =
    cells(s, dir).orderBy("array_id", "i0", "i1")

  val a1Sql: String =
    s"""WITH $cellsSql
       |SELECT * FROM cells ORDER BY array_id, i0, i1""".stripMargin

  // --- a2_subset_read: read_data(array, bounds) (base.py:225-270) ---------
  // bounds = [5:15, 2:10] on array 'click'. On partitioned+sorted storage
  // this is pruning + row-group skip; the filter reaches the scan.

  /** One dimension of a bounds request: `[lo, hi)` every `step`-th index —
    * the full `arr[lo:hi:step]` slice the reference accepts through
    * slice_converter (base.py:236, base.py:279), not just the contiguous
    * form. The range bounds drive partition pruning / row-group skipping;
    * the stride is one extra cheap predicate evaluated at the scan.
    */
  final case class Dim(lo: Long, hi: Long, step: Long = 1L)

  def sliceRead(c: DataFrame, arrayId: String, d0: Dim, d1: Dim): DataFrame = {
    graft.Errors.requireBounds((d0.lo, d0.hi), (d1.lo, d1.hi))
    graft.Errors.requireStep(d0.step); graft.Errors.requireStep(d1.step)
    val base = col("array_id") === arrayId &&
      col("i0") >= d0.lo && col("i0") < d0.hi &&
      col("i1") >= d1.lo && col("i1") < d1.hi
    val strided = Seq((col("i0"), d0), (col("i1"), d1)).collect {
      case (i, d) if d.step > 1 => pmod(i - d.lo, lit(d.step)) === 0
    }
    c.filter(strided.foldLeft(base)(_ && _))
  }

  def sliceRead(c: DataFrame, arrayId: String,
                b0: (Long, Long), b1: (Long, Long)): DataFrame =
    sliceRead(c, arrayId, Dim(b0._1, b0._2), Dim(b1._1, b1._2))

  /** Flow-controlled subset read: the client-side pattern the reference
    * prescribes after CONTENT_TOO_LARGE ("use smaller subset",
    * consts.py:19, httpx_client.py rate handling) — split a too-large
    * bounds request into tile-aligned chunks and union the pruned scans.
    * Each chunk is bounded work; the union is a no-shuffle concatenation.
    * `maxCells` models the server's data-points limit.
    */
  def chunkedSliceRead(c: DataFrame, arrayId: String, d0: Dim, d1: Dim,
                       maxCells: Long): DataFrame = {
    graft.Errors.requireBounds((d0.lo, d0.hi), (d1.lo, d1.hi))
    graft.Errors.requireStep(d0.step); graft.Errors.requireStep(d1.step)
    // selected-index counts per dim (ceil of span/step); overflow-free
    // "rows0 * rows1 <= maxCells" (the product of two valid bounds spans
    // can exceed Long.MaxValue)
    val rows1 = (d1.hi - d1.lo + d1.step - 1) / d1.step
    val rows0 = (d0.hi - d0.lo + d0.step - 1) / d0.step
    if (rows1 == 0 || rows0 <= maxCells / math.max(1L, rows1))
      sliceRead(c, arrayId, d0, d1)
    else {
      // chunk extents are multiples of d0.step, so every chunk's stride
      // phase stays anchored at the request's lo
      val chunk = math.max(1L, maxCells / math.max(1L, rows1)) * d0.step
      val chunks = (d0.lo until d0.hi by chunk).map { lo =>
        sliceRead(c, arrayId, Dim(lo, math.min(lo + chunk, d0.hi), d0.step), d1)
      }
      chunks.reduce(_ unionByName _)
    }
  }

  def chunkedSliceRead(c: DataFrame, arrayId: String,
                       b0: (Long, Long), b1: (Long, Long),
                       maxCells: Long = Long.MaxValue): DataFrame =
    chunkedSliceRead(c, arrayId, Dim(b0._1, b0._2), Dim(b1._1, b1._2), maxCells)

  /** The SERVER side of the flow-control contract [[chunkedSliceRead]]
    * recovers from: a single read whose selected-point count (the
    * bounding-box lattice the reference sizes a response by, not the
    * populated-cell count — the server rejects BEFORE materializing
    * anything) exceeds the per-request quota raises the typed
    * points-limit error (errors.py:77, httpx_client.py:59). Distinct
    * from the 429 request rate (a18/st6) and the memory-flavored 413
    * (GraftSubsetTooLargeError).
    */
  def sliceReadLimited(c: DataFrame, arrayId: String, d0: Dim, d1: Dim,
                       pointsQuota: Long): DataFrame = {
    graft.Errors.requireBounds((d0.lo, d0.hi), (d1.lo, d1.hi))
    graft.Errors.requireStep(d0.step); graft.Errors.requireStep(d1.step)
    val rows0 = (d0.hi - d0.lo + d0.step - 1) / d0.step
    val rows1 = (d1.hi - d1.lo + d1.step - 1) / d1.step
    // overflow-free "rows0 * rows1 > quota" check (the product of two
    // valid spans can exceed Long.MaxValue), saturating for the message
    if (rows1 > 0 && rows0 > pointsQuota / rows1)
      graft.Errors.requirePoints(
        if (rows0 > Long.MaxValue / rows1) Long.MaxValue else rows0 * rows1,
        pointsQuota)
    sliceRead(c, arrayId, d0, d1)
  }

  def a2SubsetRead(s: SparkSession, dir: String): DataFrame =
    sliceRead(cellsStored(s, dir), "click", (5L, 15L), (2L, 10L))
      .select("array_id", "i0", "i1", "value")
      .orderBy("i0", "i1")

  val a2Sql: String =
    s"""WITH $cellsSql
       |SELECT array_id, i0, i1, value FROM cells
       |WHERE array_id = 'click' AND i0 >= 5 AND i0 < 15 AND i1 >= 2 AND i1 < 10
       |ORDER BY i0, i1""".stripMargin

  // --- a3_subset_update: update(array, bounds, data) (base.py:272-303) ----
  // Copy-on-write patch: a narrow map-side CASE WHEN — no shuffle, no
  // driver collect. Patch grid value = i0*16+i1 (a deterministic payload
  // standing in for the request body).
  def patch(c: DataFrame, arrayId: String, d0: Dim, d1: Dim,
            data: Column): DataFrame = {
    graft.Errors.requireStep(d0.step); graft.Errors.requireStep(d1.step)
    val inBounds = col("array_id") === arrayId &&
      col("i0") >= d0.lo && col("i0") < d0.hi &&
      col("i1") >= d1.lo && col("i1") < d1.hi
    val onStride = Seq((col("i0"), d0), (col("i1"), d1)).collect {
      case (i, d) if d.step > 1 => pmod(i - d.lo, lit(d.step)) === 0
    }.foldLeft(inBounds)(_ && _)
    c.withColumn("value", when(onStride, data).otherwise(col("value")))
  }

  def patch(c: DataFrame, arrayId: String,
            b0: (Long, Long), b1: (Long, Long), data: Column): DataFrame =
    patch(c, arrayId, Dim(b0._1, b0._2), Dim(b1._1, b1._2), data)

  def a3SubsetUpdate(s: SparkSession, dir: String): DataFrame =
    patch(cellsStored(s, dir), "click", (10L, 20L), (4L, 12L),
          (col("i0") * 16 + col("i1")).cast("double"))
      .filter(col("array_id") === "click")
      .select("i0", "i1", "value")
      .orderBy("i0", "i1")

  val a3Sql: String =
    s"""WITH $cellsSql
       |SELECT i0, i1,
       |  CASE WHEN i0 >= 10 AND i0 < 20 AND i1 >= 4 AND i1 < 12
       |       THEN CAST(i0 * 16 + i1 AS DOUBLE) ELSE value END AS value
       |FROM cells WHERE array_id = 'click' ORDER BY i0, i1""".stripMargin

  // --- a4_subset_clear: clear(array, bounds) (base.py:305-311) ------------
  def a4SubsetClear(s: SparkSession, dir: String): DataFrame =
    patch(cellsStored(s, dir), "error", (0L, 10L), (0L, 8L), lit(0.0))
      .filter(col("array_id") === "error")
      .groupBy("array_id")
      .agg(count(lit(1)).as("n_cells"),
           Det.dsum(col("value")).as("value_sum"),
           count(when(col("value") === 0.0, 1)).as("n_zero"))

  val a4Sql: String =
    s"""WITH $cellsSql, cleared AS (
       |  SELECT array_id,
       |    CASE WHEN i0 >= 0 AND i0 < 10 AND i1 >= 0 AND i1 < 8
       |         THEN 0.0 ELSE value END AS value
       |  FROM cells WHERE array_id = 'error')
       |SELECT array_id, COUNT(*) AS n_cells,
       |  ${Det.sqlDsum("value")} AS value_sum,
       |  COUNT(CASE WHEN value = 0.0 THEN 1 END) AS n_zero
       |FROM cleared GROUP BY array_id""".stripMargin

  // --- a5_meta_read: read_meta by id (base.py:166-185) --------------------
  /** Mode-aware meta lookup (base.py:166 read_meta routing; errors.py:89
    * FilteringByIdInClusterIsForbidden): graft collections carry primary
    * attributes (the vgrid hash key a7 addresses), so in cluster mode an
    * id-addressed lookup cannot be ring-routed and is rejected with the
    * typed error BEFORE any job launches; single-node mode serves it.
    */
  def metaLookup(s: SparkSession, dir: String, byId: Option[String],
                 clusterMode: Boolean): DataFrame = {
    if (byId.isDefined)
      graft.Errors.requireIdFilterAllowed(clusterMode, hasPrimaryAttrs = true)
    byId.foldLeft(catalog(s, dir))((c, id) => c.filter(col("array_id") === id))
      .select("coll", "array_id", "dtype", "dim0_size", "dim1_size",
              "n_cells", "value_sum", "attr_source", "attr_unit")
  }

  def a5MetaRead(s: SparkSession, dir: String): DataFrame =
    metaLookup(s, dir, byId = Some("click"), clusterMode = false)

  val a5Sql: String =
    s"""WITH $cellsSql, $catalogSql
       |SELECT coll, array_id, dtype, dim0_size, dim1_size, n_cells,
       |  value_sum, attr_source, attr_unit
       |FROM catalog WHERE array_id = 'click'""".stripMargin

  // --- a6_attrs_update: update_meta_custom_attributes (base.py:187-208) ---
  // Custom attrs held as a map column; update = map_concat overwrite.
  // Output serialized with fixed key order so the oracle is stable.
  def a6AttrsUpdate(s: SparkSession, dir: String): DataFrame =
    catalog(s, dir)
      .withColumn("attrs", map(
        lit("source"), col("attr_source"),
        lit("unit"), col("attr_unit")))
      .withColumn("attrs", map_concat(
        map_filter(col("attrs"), (k, _) => k =!= "unit"),
        map(lit("unit"), lit("eur"), lit("quality"), lit("0.9"))))
      .select(col("array_id"),
              concat(lit("{\"quality\":\""), col("attrs")("quality"),
                     lit("\",\"source\":\""), col("attrs")("source"),
                     lit("\",\"unit\":\""), col("attrs")("unit"),
                     lit("\"}")).as("custom_attributes"))
      .orderBy("array_id")

  val a6Sql: String =
    s"""WITH $cellsSql, $catalogSql
       |SELECT array_id,
       |  '{"quality":"0.9","source":"' || attr_source || '","unit":"eur"}'
       |    AS custom_attributes
       |FROM catalog ORDER BY array_id""".stripMargin

  // --- a7_get_by_primary: get_by_primary_attributes (base.py:333-382) -----
  // Lookup key "vid/v0-v1" built exactly like utils/hashing.py:8-21, with
  // the tile join constraining BOTH vgrid dims (the key's v1 is a real
  // coordinate — 'view/1-1' is the upper-bucket half of day-tile 1).
  def a7GetByPrimary(s: SparkSession, dir: String): DataFrame = {
    val t = tiles(s, dir).filter(col("hash_key") === "view/1-1")
    val c = cellsStored(s, dir)
    c.join(broadcast(t),
           c("array_id") === t("vid") &&
           (c("i0") / Tile0).cast("long") === t("v0") &&
           (c("i1") / Tile1).cast("long") === t("v1"))
      .groupBy("vid", "v0", "v1", "hash_key")
      .agg(count(lit(1)).as("n_cells"),
           Det.dsum(col("value")).as("value_sum"))
  }

  val a7Sql: String =
    s"""WITH $cellsSql, $tilesSql
       |SELECT vid, v0, v1, hash_key, COUNT(*) AS n_cells,
       |  ${Det.sqlDsum("value")} AS value_sum
       |FROM cells JOIN tiles
       |  ON array_id = vid AND CAST(i0 // $Tile0 AS BIGINT) = v0
       |    AND CAST(i1 // $Tile1 AS BIGINT) = v1
       |WHERE hash_key = 'view/1-1'
       |GROUP BY vid, v0, v1, hash_key""".stripMargin

  // --- a8_list_arrays: __iter__ over the collection (base.py:436-452) -----
  def a8ListArrays(s: SparkSession, dir: String): DataFrame =
    catalog(s, dir)
      .select("coll", "array_id", "dim0_size", "dim1_size", "n_cells", "value_sum")
      .orderBy("array_id")

  val a8Sql: String =
    s"""WITH $cellsSql, $catalogSql
       |SELECT coll, array_id, dim0_size, dim1_size, n_cells, value_sum
       |FROM catalog ORDER BY array_id""".stripMargin

  // --- a9_delete_by_vid: delete_all_by_vid (array_adapter.py:41-77) -------
  // Distributed anti-join of cells against the doomed vid's tiles — the
  // reference loops a threadpool of per-array HTTP deletes; here one
  // narrow join does all of them.
  def a9DeleteByVid(s: SparkSession, dir: String): DataFrame = {
    val c = cellsStored(s, dir)
    val doomed = tiles(s, dir).filter(col("vid") === "error")
    c.join(broadcast(doomed),
           c("array_id") === doomed("vid") &&
           (c("i0") / Tile0).cast("long") === doomed("v0") &&
           (c("i1") / Tile1).cast("long") === doomed("v1"),
           "left_anti")
      .groupBy("array_id")
      .agg(count(lit(1)).as("n_cells"),
           Det.dsum(col("value")).as("value_sum"))
      .orderBy("array_id")
  }

  val a9Sql: String =
    s"""WITH $cellsSql, $tilesSql
       |SELECT array_id, COUNT(*) AS n_cells,
       |  ${Det.sqlDsum("value")} AS value_sum
       |FROM cells c
       |WHERE NOT EXISTS (SELECT 1 FROM tiles t
       |  WHERE t.vid = 'error' AND c.array_id = t.vid
       |    AND CAST(c.i0 // $Tile0 AS BIGINT) = t.v0
       |    AND CAST(c.i1 // $Tile1 AS BIGINT) = t.v1)
       |GROUP BY array_id ORDER BY array_id""".stripMargin

  // --- a10_varray_assemble: vgrid tile <-> global coords ------------------
  // Pure arithmetic projection (no shuffle) over the 2-D vgrid:
  // local = (i0 % T0, i1 % T1), tile = (i0 / T0, i1 / T1),
  // global = tile·T + local per dim. Round-trips exactly.
  def a10VarrayAssemble(s: SparkSession, dir: String): DataFrame =
    cellsStored(s, dir).filter(col("array_id") === "signup")
      .select(
        (col("i0") / Tile0).cast("long").as("v0"),
        (col("i1") / Tile1).cast("long").as("v1"),
        pmod(col("i0"), lit(Tile0)).cast("long").as("l0"),
        pmod(col("i1"), lit(Tile1)).cast("long").as("l1"),
        col("value"))
      .withColumn("g0", col("v0") * Tile0 + col("l0"))
      .withColumn("g1", col("v1") * Tile1 + col("l1"))
      .orderBy("g0", "g1")

  val a10Sql: String =
    s"""WITH $cellsSql
       |SELECT CAST(i0 // $Tile0 AS BIGINT) AS v0,
       |  CAST(i1 // $Tile1 AS BIGINT) AS v1,
       |  CAST(i0 % $Tile0 AS BIGINT) AS l0,
       |  CAST(i1 % $Tile1 AS BIGINT) AS l1, value,
       |  CAST(i0 // $Tile0 AS BIGINT) * $Tile0 + CAST(i0 % $Tile0 AS BIGINT) AS g0,
       |  CAST(i1 // $Tile1 AS BIGINT) * $Tile1 + CAST(i1 % $Tile1 AS BIGINT) AS g1
       |FROM cells WHERE array_id = 'signup' ORDER BY g0, g1""".stripMargin

  // --- a11_hashring_place: consistent-hash placement (hash_ring.py) -------
  // genKey as a codegen'd column expression; successor lookup through the
  // native RingLookup expression (O(log ring) binary search per row) —
  // zero shuffle, placement of any number of tiles is embarrassingly
  // parallel.
  private def placeExpr(ring: HashRing, keyCol: String): Column =
    graft.plans.RingLookup.place(graft.functions.GenKey(col(keyCol)), ring)

  def a11HashringPlace(s: SparkSession, dir: String): DataFrame =
    tiles(s, dir)
      .withColumn("node", placeExpr(HashRing.current, "hash_key"))
      .select("vid", "v0", "v1", "hash_key", "node")
      .orderBy("vid", "v0", "v1")

  private def duckPlace(ring: HashRing, alias: String): String =
    s"""COALESCE(
       |  (SELECT MIN(k) FROM $alias WHERE k > ${HashRing.duckGenKey("hash_key")}),
       |  (SELECT MIN(k) FROM $alias))""".stripMargin

  val a11Sql: String =
    s"""WITH $cellsSql, $tilesSql,
       |ring(k, node) AS (VALUES ${HashRing.current.sqlValues})
       |SELECT vid, v0, v1, hash_key,
       |  (SELECT node FROM ring WHERE k = ${duckPlace(HashRing.current, "ring")}) AS node
       |FROM tiles ORDER BY vid, v0, v1""".stripMargin

  // --- a12_ring_rebalance: current vs target ring diff --------------------
  // cluster_config.py:126-145 keeps a current + target HashRing during
  // rebalancing; an array is "moved" when its owner differs (models.py
  // Status.MOVED / utils/requests.py:117-121).
  def a12RingRebalance(s: SparkSession, dir: String): DataFrame =
    tiles(s, dir)
      .withColumn("node", placeExpr(HashRing.current, "hash_key"))
      .withColumn("target_node", placeExpr(HashRing.target, "hash_key"))
      .withColumn("status",
        when(col("node") =!= col("target_node"), lit("exported"))
          .otherwise(lit("normal")))
      .select("vid", "v0", "v1", "hash_key", "node", "target_node", "status")
      .orderBy("vid", "v0", "v1")

  val a12Sql: String =
    s"""WITH $cellsSql, $tilesSql,
       |ring(k, node) AS (VALUES ${HashRing.current.sqlValues}),
       |tring(k, node) AS (VALUES ${HashRing.target.sqlValues}),
       |placed AS (
       |  SELECT vid, v0, v1, hash_key,
       |    (SELECT node FROM ring WHERE k = ${duckPlace(HashRing.current, "ring")}) AS node,
       |    (SELECT node FROM tring WHERE k = ${duckPlace(HashRing.target, "tring")}) AS target_node
       |  FROM tiles)
       |SELECT vid, v0, v1, hash_key, node, target_node,
       |  CASE WHEN node <> target_node THEN 'exported' ELSE 'normal' END AS status
       |FROM placed ORDER BY vid, v0, v1""".stripMargin

  // --- a13_subset_chunked: flow-controlled read == direct read ------------
  // maxCells=64 forces the 10x8 request into tile-sized chunks; the oracle
  // is the *unchunked* slice — equivalence is the semantic contract.
  def a13SubsetChunked(s: SparkSession, dir: String): DataFrame =
    chunkedSliceRead(cellsStored(s, dir), "view", (5L, 15L), (2L, 10L), maxCells = 64)
      .select("array_id", "i0", "i1", "value")
      .orderBy("i0", "i1")

  val a13Sql: String =
    s"""WITH $cellsSql
       |SELECT array_id, i0, i1, value FROM cells
       |WHERE array_id = 'view' AND i0 >= 5 AND i0 < 15 AND i1 >= 2 AND i1 < 10
       |ORDER BY i0, i1""".stripMargin

  // --- a14_dense_read: dense subset read with fill value ------------------
  // Deker's read_data returns a DENSE ndarray — absent cells surface as the
  // fill value (base.py:265-270 reshapes the byte stream to the full slice
  // shape). Sparse cells LEFT-joined onto the vgrid coordinate source
  // (GridSource: one InputPartition per tile, bounds pushed down so
  // non-intersecting tiles never launch tasks) + coalesce(fill).
  def a14DenseRead(s: SparkSession, dir: String): DataFrame = {
    val grid = s.read.format("graft.sources.GridSource")
      .option("d0", 30).option("d1", Dim1Size)
      .option("t0", Tile0).option("t1", Dim1Size)
      .load()
      .filter(col("i0") >= 5 && col("i0") < 15 && col("i1") >= 2 && col("i1") < 10)
    val slice = sliceRead(cellsStored(s, dir), "click", (5L, 15L), (2L, 10L))
      .select("i0", "i1", "value")
    grid.join(slice, Seq("i0", "i1"), "left")
      .select(col("i0"), col("i1"), col("v0"), col("v1"),
              coalesce(col("value"), lit(0.0)).as("value"))
      .orderBy("i0", "i1")
  }

  val a14Sql: String =
    s"""WITH $cellsSql,
       |grid AS (
       |  SELECT a.i0, b.i1, a.i0 // $Tile0 AS v0, b.i1 // $Dim1Size AS v1
       |  FROM (SELECT unnest(range(5, 15)) AS i0) a
       |  CROSS JOIN (SELECT unnest(range(2, 10)) AS i1) b)
       |SELECT g.i0, g.i1, g.v0, g.v1, COALESCE(c.value, 0.0) AS value
       |FROM grid g LEFT JOIN
       |  (SELECT i0, i1, value FROM cells WHERE array_id = 'click') c
       |  USING (i0, i1)
       |ORDER BY g.i0, g.i1""".stripMargin

  // --- a15_subset_stats: reductions over a slice --------------------------
  // Array math after read_data is the consumer's first move; at scale it
  // should happen in-engine, on the pruned slice, not on a driver ndarray.
  // Variance from exact decimal Σx / Σx² (order-free), then IEEE-exact
  // sqrt — deterministic on both engines.
  def a15SubsetStats(s: SparkSession, dir: String): DataFrame = {
    val slice = sliceRead(cellsStored(s, dir), "purchase", (0L, 20L), (0L, 16L))
    slice.groupBy("array_id")
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("min_v"), max(col("value")).as("max_v"),
           Det.davg(col("value")).as("mean_v"),
           sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 8)))
             .cast("double").as("sum_v"),
           sum((col("value") * col("value"))
             .cast(org.apache.spark.sql.types.DecimalType(28, 8)))
             .cast("double").as("sum_sq"))
      .withColumn("stddev_v",
        sqrt(col("sum_sq") / col("n") - (col("sum_v") / col("n")) * (col("sum_v") / col("n"))))
      .select("array_id", "n", "min_v", "max_v", "mean_v", "stddev_v")
  }

  val a15Sql: String =
    s"""WITH $cellsSql,
       |slice AS (
       |  SELECT array_id, value FROM cells
       |  WHERE array_id = 'purchase' AND i0 >= 0 AND i0 < 20
       |    AND i1 >= 0 AND i1 < 16),
       |agg AS (
       |  SELECT array_id, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
       |    ${Det.sqlDavg("value")} AS mean_v,
       |    ${Det.sqlD2d("SUM(CAST(value AS DECIMAL(28,8)))")} AS sum_v,
       |    ${Det.sqlD2d("SUM(CAST(value * value AS DECIMAL(28,8)))")} AS sum_sq
       |  FROM slice GROUP BY array_id)
       |SELECT array_id, n, min_v, max_v, mean_v,
       |  sqrt(sum_sq / n - (sum_v / n) * (sum_v / n)) AS stddev_v
       |FROM agg""".stripMargin

  // --- a16_label_read: label-indexed subset (Deker datetime scales) -------
  // Deker dimensions carry labels/scales (datetimes here); users slice by
  // label and the engine converts to index bounds. Same pruned scan as a2
  // once the conversion (label - origin) / step is applied.
  def a16LabelRead(s: SparkSession, dir: String): DataFrame = {
    val origin = java.time.LocalDate.parse("2024-01-01")
    def toIdx(label: String): Long =
      java.time.temporal.ChronoUnit.DAYS.between(origin, java.time.LocalDate.parse(label))
    sliceRead(cellsStored(s, dir), "signup",
        (toIdx("2024-01-06"), toIdx("2024-01-16")), (0L, 16L))
      .select("array_id", "i0", "i1", "value")
      .orderBy("i0", "i1")
  }

  val a16Sql: String =
    s"""WITH $cellsSql
       |SELECT array_id, i0, i1, value FROM cells
       |WHERE array_id = 'signup'
       |  AND i0 >= date_diff('day', DATE '2024-01-01', DATE '2024-01-06')
       |  AND i0 <  date_diff('day', DATE '2024-01-01', DATE '2024-01-16')
       |  AND i1 >= 0 AND i1 < 16
       |ORDER BY i0, i1""".stripMargin

  // --- a17_read_replicas: failover preference list per array --------------
  // The reference's read path retries across cluster nodes when the owner
  // is unreachable (utils/requests.py:47); the deterministic engine form is
  // the ketama replica set — the first 3 DISTINCT nodes clockwise from the
  // key (owner first). Native RingReplicas expression: codegen'd, O(log
  // ring + walk) per row, embarrassingly parallel like a11.
  def a17ReadReplicas(s: SparkSession, dir: String): DataFrame =
    tiles(s, dir)
      .withColumn("reps", graft.plans.RingReplicas.replicas(
        graft.functions.GenKey(col("hash_key")), HashRing.current, 3))
      .select(col("vid"), col("v0"), col("v1"), col("hash_key"),
              element_at(col("reps"), 1).as("replica_1"),
              element_at(col("reps"), 2).as("replica_2"),
              element_at(col("reps"), 3).as("replica_3"))
      .orderBy("vid", "v0", "v1")

  val a17Sql: String =
    s"""WITH $cellsSql, $tilesSql,
       |ring(k, node) AS (VALUES ${HashRing.current.sqlValues}),
       |tkeys AS (
       |  SELECT vid, v0, v1, hash_key, ${HashRing.duckGenKey("hash_key")} AS h
       |  FROM tiles),
       |ranked AS (
       |  SELECT hash_key, node,
       |    ROW_NUMBER() OVER (PARTITION BY hash_key ORDER BY min_ord) AS rr
       |  FROM (
       |    SELECT t.hash_key, r.node,
       |      MIN(CASE WHEN r.k > t.h THEN r.k - t.h
       |               ELSE r.k - t.h + 4294967296 END) AS min_ord
       |    FROM tkeys t CROSS JOIN ring r
       |    GROUP BY t.hash_key, r.node))
       |SELECT t.vid, t.v0, t.v1, t.hash_key,
       |  MAX(CASE WHEN rr = 1 THEN node END) AS replica_1,
       |  MAX(CASE WHEN rr = 2 THEN node END) AS replica_2,
       |  MAX(CASE WHEN rr = 3 THEN node END) AS replica_3
       |FROM tkeys t JOIN ranked USING (hash_key)
       |WHERE rr <= 3
       |GROUP BY t.vid, t.v0, t.v1, t.hash_key
       |ORDER BY vid, v0, v1""".stripMargin

  // --- a18_rate_limit: flow-control throttling as a data transform --------
  // httpx_client.py surfaces 429 + RateLimit-{Limit,Remaining} headers; the
  // engine-side equivalent is a per-(user, day) token budget applied with
  // one window pass — request seq > cap => throttled. One shuffle on the
  // rate key; WindowGroupLimit doesn't apply (every row is kept) but the
  // frame is a running count, no sort-spill risk beyond the key group.
  val RateCap = 5

  def a18RateLimit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day_idx").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("day_idx", expr("unix_micros(ts) div 86400000000"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_requests"),
           sum(when(col("seq") > RateCap, 1L).otherwise(0L)).as("n_throttled"))
      .filter(col("n_throttled") > 0)
      .orderBy("user_id")
  }

  val a18Sql: String =
    s"""SELECT user_id, COUNT(*) AS n_requests,
       |  CAST(SUM(CASE WHEN seq > $RateCap THEN 1 ELSE 0 END) AS BIGINT) AS n_throttled
       |FROM (
       |  SELECT user_id,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
       |                       ORDER BY ts, event_id) AS seq
       |  FROM events)
       |GROUP BY user_id
       |HAVING SUM(CASE WHEN seq > $RateCap THEN 1 ELSE 0 END) > 0
       |ORDER BY user_id""".stripMargin

  // --- a19_list_collections: iterate collections (collection_adapter.py) --
  // The client holds MANY collections; iteration is a catalog-level scan —
  // per-collection array counts + cell stats from the union of the (tiny,
  // broadcastable) per-collection catalogs, never a scan of the cells.
  // The union carries each collection's DECLARED dtype (the schema field
  // the reference round-trips, base.py:35-48); catalog-level value stats
  // deliberately widen to double (a summary, not the data) — the cell
  // stores themselves stay dtype-native, which a27/a29 prove bit-exactly.
  private def allCells(s: SparkSession, dir: String): DataFrame =
    cellsStored(s, dir).withColumn("dtype", lit("float64"))
      .unionByName(corpusCells(s, dir).withColumn("dtype", lit("float64")))
      .unionByName(intCells(s, dir)
        .withColumn("value", col("value").cast("double"))
        .withColumn("dtype", lit("int64")))
      .unionByName(floatCells(s, dir)
        .withColumn("value", col("value").cast("double"))
        .withColumn("dtype", lit("float32")))

  /** The unified-catalog CTE (needs cells, corpus_cells, int_cells,
    * float_cells in scope) mirroring [[allCells]].
    */
  private val allCellsSql: String =
    """all_cells AS (
      |  SELECT coll, array_id, i0, i1, value, 'float64' AS dtype FROM cells
      |  UNION ALL
      |  SELECT coll, array_id, i0, i1, value, 'float64' FROM corpus_cells
      |  UNION ALL
      |  SELECT coll, array_id, i0, i1, CAST(value AS DOUBLE), 'int64' FROM int_cells
      |  UNION ALL
      |  SELECT coll, array_id, i0, i1, CAST(value AS DOUBLE), 'float32' FROM float_cells)""".stripMargin

  def a19ListCollections(s: SparkSession, dir: String): DataFrame =
    allCells(s, dir)
      .groupBy("coll", "dtype")
      .agg(countDistinct(col("array_id")).as("n_arrays"),
           count(lit(1)).as("n_cells"),
           Det.dsum(col("value")).as("value_sum"))
      .select("coll", "n_arrays", "n_cells", "value_sum", "dtype")
      .orderBy("coll")

  val a19Sql: String =
    s"""WITH $cellsSql, $corpusCellsSql, $intCellsSql, $floatCellsSql,
       |$allCellsSql
       |SELECT coll, COUNT(DISTINCT array_id) AS n_arrays,
       |  COUNT(*) AS n_cells, ${Det.sqlDsum("value")} AS value_sum, dtype
       |FROM all_cells GROUP BY coll, dtype ORDER BY coll""".stripMargin

  // --- a20_collection_delete: delete a collection (collection_adapter.py) -
  // Deleting 'corpus' = anti-join the unified catalog against the deleted
  // name; survivors listed with their array stats. At scale this is a
  // partition-directory drop (the store partitions by coll first), not a
  // data rewrite — the query shows the catalog-state transition.
  def a20CollectionDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val deleted = Seq(CorpusColl).toDF("del_coll")
    allCells(s, dir)
      .join(broadcast(deleted), col("coll") === col("del_coll"), "left_anti")
      .groupBy("coll", "array_id")
      .agg(count(lit(1)).as("n_cells"), Det.dsum(col("value")).as("value_sum"))
      .orderBy("coll", "array_id")
  }

  val a20Sql: String =
    s"""WITH $cellsSql, $corpusCellsSql, $intCellsSql, $floatCellsSql,
       |$allCellsSql
       |SELECT coll, array_id, COUNT(*) AS n_cells,
       |  ${Det.sqlDsum("value")} AS value_sum
       |FROM all_cells WHERE coll <> '$CorpusColl'
       |GROUP BY coll, array_id ORDER BY coll, array_id""".stripMargin

  // --- a21_subset_read_3d: n-dimensional slice semantics ------------------
  // Deker arrays are n-dimensional; the long-form encoding extends by one
  // index column per dimension with the same pruning story (sorted layout
  // → row-group skip per dim). 3-D here: (day, user bucket, hour-of-day),
  // bounds on all three dims, derived on the fly from events (the
  // derivation is itself one map-side-combined agg).
  def cells3(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        col("event_type").as("array_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).cast("long").as("i0"),
        pmod(col("user_id"), lit(Dim1Size)).cast("long").as("i1"),
        hour(col("ts")).cast("long").as("i2"))
      .agg(Det.dsum(col("value")).as("value"))
      .filter(col("i0") >= 0)

  val cells3Sql: String =
    s"""cells3 AS (
       |  SELECT event_type AS array_id,
       |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS i0,
       |    CAST(((user_id % $Dim1Size) + $Dim1Size) % $Dim1Size AS BIGINT) AS i1,
       |    CAST(hour(ts) AS BIGINT) AS i2,
       |    ${Det.sqlDsum("value")} AS value
       |  FROM events GROUP BY 1, 2, 3, 4
       |  HAVING i0 >= 0
       |)""".stripMargin

  def a21SubsetRead3d(s: SparkSession, dir: String): DataFrame =
    cells3(s, dir)
      .filter(col("array_id") === "view" &&
              col("i0") >= 5 && col("i0") < 10 &&
              col("i1") >= 0 && col("i1") < 8 &&
              col("i2") >= 6 && col("i2") < 18)
      .select("array_id", "i0", "i1", "i2", "value")
      .orderBy("i0", "i1", "i2")

  val a21Sql: String =
    s"""WITH $cells3Sql
       |SELECT array_id, i0, i1, i2, value FROM cells3
       |WHERE array_id = 'view' AND i0 >= 5 AND i0 < 10
       |  AND i1 >= 0 AND i1 < 8 AND i2 >= 6 AND i2 < 18
       |ORDER BY i0, i1, i2""".stripMargin

  // --- a22_strided_read: stepped slice bounds -----------------------------
  // The reference's Slice accepts a step through slice_converter
  // (base.py:236 read_data bounds, base.py:279 update bounds): arr[5:25:2,
  // 0:16:3]. The stride is an extra scan-time predicate on top of the
  // pruned range read — same storage story as a2, strictly fewer rows out.
  def a22StridedRead(s: SparkSession, dir: String): DataFrame =
    sliceRead(cellsStored(s, dir), "click", Dim(5L, 25L, 2L), Dim(0L, 16L, 3L))
      .select("array_id", "i0", "i1", "value")
      .orderBy("i0", "i1")

  val a22Sql: String =
    s"""WITH $cellsSql
       |SELECT array_id, i0, i1, value FROM cells
       |WHERE array_id = 'click' AND i0 >= 5 AND i0 < 25 AND (i0 - 5) % 2 = 0
       |  AND i1 >= 0 AND i1 < 16 AND (i1 - 0) % 3 = 0
       |ORDER BY i0, i1""".stripMargin

  // --- a23_leader_redirect: MISDIRECTED_REQUEST retry targets -------------
  // httpx_client.py:44-66: a request landing on a node that no longer owns
  // the key gets 421, the client re-applies the cluster config and retries
  // against the new owner. The engine form: for every tile whose owner
  // changes between the current and target rings (the a12 moved-set), emit
  // the retry route first_attempt -> redirected_to with the attempt count
  // the reference's retry loop would burn (2 = original + one redirect).
  // Same zero-shuffle placement expressions as a11/a12.
  def a23LeaderRedirect(s: SparkSession, dir: String): DataFrame =
    tiles(s, dir)
      .withColumn("first_attempt", placeExpr(HashRing.current, "hash_key"))
      .withColumn("redirected_to", placeExpr(HashRing.target, "hash_key"))
      .filter(col("first_attempt") =!= col("redirected_to"))
      .withColumn("n_attempts", lit(2L))
      .select("vid", "v0", "v1", "hash_key", "first_attempt", "redirected_to",
              "n_attempts")
      .orderBy("vid", "v0", "v1")

  val a23Sql: String =
    s"""WITH $cellsSql, $tilesSql,
       |ring(k, node) AS (VALUES ${HashRing.current.sqlValues}),
       |tring(k, node) AS (VALUES ${HashRing.target.sqlValues}),
       |placed AS (
       |  SELECT vid, v0, v1, hash_key,
       |    (SELECT node FROM ring WHERE k = ${duckPlace(HashRing.current, "ring")}) AS first_attempt,
       |    (SELECT node FROM tring WHERE k = ${duckPlace(HashRing.target, "tring")}) AS redirected_to
       |  FROM tiles)
       |SELECT vid, v0, v1, hash_key, first_attempt, redirected_to,
       |  CAST(2 AS BIGINT) AS n_attempts
       |FROM placed WHERE first_attempt <> redirected_to
       |ORDER BY vid, v0, v1""".stripMargin

  // --- a24_strided_dense_read: dense stepped slice ------------------------
  // read_data with a stepped Slice returns a DENSE array of the selected
  // lattice (base.py:265-270 reshape; slice_converter step). The vgrid
  // coordinate source generates exactly the stride-aligned lattice (tiles
  // with no aligned index are pruned at plan time; readers step, never
  // generate-then-drop), LEFT-joined with the identically-strided sparse
  // slice, absent cells surfacing as the fill value.
  def a24StridedDenseRead(s: SparkSession, dir: String): DataFrame = {
    val grid = s.read.format("graft.sources.GridSource")
      .option("d0", 30).option("d1", Dim1Size)
      .option("t0", Tile0).option("t1", Tile1)
      .option("s0", 2).option("a0", 5)
      .option("s1", 3).option("a1", 0)
      .load()
      .filter(col("i0") >= 5 && col("i0") < 25 && col("i1") >= 0 && col("i1") < 16)
    val slice = sliceRead(cellsStored(s, dir), "click", Dim(5, 25, 2), Dim(0, 16, 3))
      .select("i0", "i1", "value")
    grid.join(slice, Seq("i0", "i1"), "left")
      .select(col("i0"), col("i1"), col("v0"), col("v1"),
              coalesce(col("value"), lit(0.0)).as("value"))
      .orderBy("i0", "i1")
  }

  val a24Sql: String =
    s"""WITH $cellsSql,
       |grid AS (
       |  SELECT a.i0, b.i1, a.i0 // $Tile0 AS v0, b.i1 // $Tile1 AS v1
       |  FROM (SELECT unnest(range(5, 25, 2)) AS i0) a
       |  CROSS JOIN (SELECT unnest(range(0, 16, 3)) AS i1) b)
       |SELECT g.i0, g.i1, g.v0, g.v1, COALESCE(c.value, 0.0) AS value
       |FROM grid g LEFT JOIN
       |  (SELECT i0, i1, value FROM cells
       |   WHERE array_id = 'click' AND i0 >= 5 AND i0 < 25 AND (i0 - 5) % 2 = 0
       |     AND i1 >= 0 AND i1 < 16 AND (i1 - 0) % 3 = 0) c
       |  USING (i0, i1)
       |ORDER BY g.i0, g.i1""".stripMargin

  // --- a25_array_combine: elementwise map algebra between two arrays ------
  // The first consumer move after read_data on a gridded store: combine two
  // variables' grids cell-by-cell (ratio of two weather fields, click/view
  // conversion here). Long form makes it a full-outer equi-join on the dim
  // indices with fill-value coalescing — absent cells are the fill value on
  // either side, exactly read_data's dense semantics (base.py:265-270).
  // Scale: each operand is ONE directory of the bucketed store (pruned
  // scan), bucketed and sorted by the full dim key (i0, i1) — both sides
  // arrive as HashPartitioning(i0, i1), covering every join key, so the
  // merge join plans with ZERO exchange: at 100 TB neither grid ever
  // shuffles (the merge hint keeps the planner on the co-located
  // sort-merge path instead of broadcasting a side; PlanAuditSpec asserts
  // the exchange-free shape).
  def a25ArrayCombine(s: SparkSession, dir: String): DataFrame = {
    val st = graft.arrays.ArrayModel.cellsBucketed(s, dir)
    val a = st.filter(col("array_id") === "click")
      .select(col("i0"), col("i1"), col("value").as("va"))
    val b = st.filter(col("array_id") === "view")
      .select(col("i0"), col("i1"), col("value").as("vb"))
    a.join(b.hint("merge"), Seq("i0", "i1"), "full_outer")
      .select(col("i0"), col("i1"),
              coalesce(col("va"), lit(0.0)).as("click_v"),
              coalesce(col("vb"), lit(0.0)).as("view_v"))
      .withColumn("sum_v", col("click_v") + col("view_v"))
      .withColumn("diff_v", col("click_v") - col("view_v"))
      .orderBy("i0", "i1")
  }

  val a25Sql: String =
    s"""WITH $cellsSql,
       |a AS (SELECT i0, i1, value FROM cells WHERE array_id = 'click'),
       |b AS (SELECT i0, i1, value FROM cells WHERE array_id = 'view')
       |SELECT COALESCE(a.i0, b.i0) AS i0, COALESCE(a.i1, b.i1) AS i1,
       |  COALESCE(a.value, 0.0) AS click_v, COALESCE(b.value, 0.0) AS view_v,
       |  COALESCE(a.value, 0.0) + COALESCE(b.value, 0.0) AS sum_v,
       |  COALESCE(a.value, 0.0) - COALESCE(b.value, 0.0) AS diff_v
       |FROM a FULL JOIN b ON a.i0 = b.i0 AND a.i1 = b.i1
       |ORDER BY i0, i1""".stripMargin

  // --- a26_array_coarsen: resolution downsample (zoom-out / pyramid) ------
  // The other standard gridded-store consumer op: aggregate CoarsenF0 x
  // CoarsenF1 blocks of cells into one coarse cell (mean + max + count) —
  // the building block of a multi-resolution pyramid. One partial-agg'd
  // groupBy keyed by the coarse tile: map-side combine collapses each
  // storage partition (sorted by (i0, i1), so coarse keys arrive clustered)
  // before the single small shuffle. Mean = IEEE division of the exact
  // decimal sum by the count — deterministic on both engines. Dim indices
  // are non-negative by the cells contract, so Spark's truncating div
  // equals the oracle's floor //.
  val CoarsenF0 = 4
  val CoarsenF1 = 4

  def a26ArrayCoarsen(s: SparkSession, dir: String): DataFrame =
    cellsStored(s, dir)
      .filter(col("array_id") === "purchase")
      .groupBy(expr(s"i0 div $CoarsenF0").as("c0"),
               expr(s"i1 div $CoarsenF1").as("c1"))
      .agg(count(lit(1)).as("n_cells"),
           Det.dsum(col("value")).as("v_sum"),
           max(col("value")).as("v_max"))
      .withColumn("v_mean", col("v_sum") / col("n_cells"))
      .select("c0", "c1", "n_cells", "v_sum", "v_max", "v_mean")
      .orderBy("c0", "c1")

  val a26Sql: String =
    s"""WITH $cellsSql
       |SELECT i0 // $CoarsenF0 AS c0, i1 // $CoarsenF1 AS c1,
       |  COUNT(*) AS n_cells, ${Det.sqlDsum("value")} AS v_sum,
       |  MAX(value) AS v_max,
       |  ${Det.sqlDsum("value")} / COUNT(*) AS v_mean
       |FROM cells WHERE array_id = 'purchase'
       |GROUP BY 1, 2 ORDER BY c0, c1""".stripMargin

  // --- a27_int_cells: dtype-faithful collection (int64) -------------------
  // Deker arrays carry their dtype in the collection schema, and the meta
  // round-trip preserves it (base.py:35-48 create_array_from_meta;
  // read_data buffers decode as array.dtype, base.py:265). Every earlier
  // collection here is float64; this op runs the standard lifecycle —
  // patch (a3's update shape), bounds read (a2's slice shape), stats
  // (a15's) — over the corpus_i64 collection WITHOUT leaving int64:
  // value arithmetic is exact BIGINT end-to-end on both engines, so a
  // silent widen to double anywhere in the path hash-mismatches the
  // oracle.
  def a27IntCells(s: SparkSession, dir: String): DataFrame =
    intCells(s, dir)
      .withColumn("value",
        when(col("i0") < 1, col("value") * 2L).otherwise(col("value")))
      .filter(col("i0") >= 0 && col("i0") < 3 &&
              col("i1") >= 0 && col("i1") < 8)
      .groupBy("coll", "array_id")
      .agg(count(lit(1)).as("n_cells"),
           sum(col("value")).as("value_sum"),
           max(col("value")).as("value_max"))
      .withColumn("dtype", lit("int64"))
      .select("coll", "array_id", "dtype", "n_cells", "value_sum", "value_max")
      .orderBy("array_id")

  val a27Sql: String =
    s"""WITH $intCellsSql
       |SELECT coll, array_id, 'int64' AS dtype, COUNT(*) AS n_cells,
       |  CAST(SUM(v) AS BIGINT) AS value_sum, MAX(v) AS value_max
       |FROM (
       |  SELECT coll, array_id, i0, i1,
       |    CASE WHEN i0 < 1 THEN value * 2 ELSE value END AS v
       |  FROM int_cells)
       |WHERE i0 >= 0 AND i0 < 3 AND i1 >= 0 AND i1 < 8
       |GROUP BY coll, array_id ORDER BY array_id""".stripMargin

  // --- a28_soft_delete: is_deleted lifecycle flags ------------------------
  // Both reference adapters expose is_deleted (base.py:313,
  // collection_adapter.py:111): deletion is server-side STATE, not a
  // client-computable rule. Re-expressed: a tombstone table (the flag
  // store — here a two-row fixture) broadcast-LEFT-joined onto the
  // unified catalog; listings carry the flag and readers filter on it.
  // At 100 TB a delete touches one catalog row — never the cells — and
  // the catalog join stays broadcast at any corpus size.
  def a28SoftDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tombstones = Seq((Coll, "error"), (CorpusColl, "src4"))
      .toDF("coll", "array_id").withColumn("tomb", lit(true))
    allCells(s, dir)
      .groupBy("coll", "array_id", "dtype")
      .agg(count(lit(1)).as("n_cells"), Det.dsum(col("value")).as("value_sum"))
      .join(broadcast(tombstones), Seq("coll", "array_id"), "left")
      .withColumn("is_deleted", coalesce(col("tomb"), lit(false)))
      .select("coll", "array_id", "dtype", "is_deleted", "n_cells", "value_sum")
      .orderBy("coll", "array_id")
  }

  val a28Sql: String =
    s"""WITH $cellsSql, $corpusCellsSql, $intCellsSql, $floatCellsSql,
       |$allCellsSql,
       |cat AS (
       |  SELECT coll, array_id, dtype, COUNT(*) AS n_cells,
       |    ${Det.sqlDsum("value")} AS value_sum
       |  FROM all_cells GROUP BY coll, array_id, dtype),
       |tombs AS (SELECT * FROM (VALUES ('$Coll', 'error'),
       |  ('$CorpusColl', 'src4')) t(coll, array_id))
       |SELECT c.coll, c.array_id, c.dtype, t.array_id IS NOT NULL AS is_deleted,
       |  n_cells, value_sum
       |FROM cat c LEFT JOIN tombs t
       |  ON c.coll = t.coll AND c.array_id = t.array_id
       |ORDER BY c.coll, c.array_id""".stripMargin

  // --- a29_float_cells: dtype-faithful collection (float32) ---------------
  // a27 proved int64; this completes the dtype story with float32, the
  // other common gridded-weather dtype (reference base.py:35-48 decodes
  // read_data buffers as array.dtype — f4 is a first-class numpy dtype
  // string). The standard lifecycle — patch (a3's update shape), bounds
  // read (a2's slice shape) — over corpus_f32 WITHOUT leaving float32:
  // the patch doubles a cell (exponent bump, exact in any IEEE width),
  // values are integer-valued within the 24-bit mantissa, and the output
  // column is FloatType end-to-end, so Spark's silent FloatType→DoubleType
  // widening coercion anywhere in the path hash-mismatches the oracle's
  // REAL.
  def a29FloatCells(s: SparkSession, dir: String): DataFrame =
    floatCells(s, dir)
      .withColumn("value",
        when(col("i0") < 1, col("value") * lit(2.0f)).otherwise(col("value")))
      .filter(col("i0") >= 0 && col("i0") < 3 &&
              col("i1") >= 0 && col("i1") < 8)
      .withColumn("dtype", lit("float32"))
      .select("coll", "array_id", "dtype", "i0", "i1", "value")
      .orderBy("array_id", "i0", "i1")

  val a29Sql: String =
    s"""WITH $floatCellsSql
       |SELECT coll, array_id, 'float32' AS dtype, i0, i1,
       |  CASE WHEN i0 < 1 THEN CAST(value * CAST(2 AS REAL) AS REAL)
       |       ELSE value END AS value
       |FROM float_cells
       |WHERE i0 >= 0 AND i0 < 3 AND i1 >= 0 AND i1 < 8
       |ORDER BY array_id, i0, i1""".stripMargin

  // --- a30_varray_assemble_3d: n-dim vgrid tiling -------------------------
  // a10 exercises the vgrid arithmetic in 2-D and a21 reads 3-D slices;
  // this closes the remaining n-dim gap: TILE ASSEMBLY over a true 3-D
  // vgrid (varray_adapter.py's v_position is an n-tuple; utils/hashing.py
  // :17 joins ALL of its coordinates). Same shuffle-free projection per
  // dim — local = i % T, v = i / T, global = v·T + local — plus the
  // reference's "-".join(v_position) primary-attribute key over all three
  // coordinates.
  def a30VarrayAssemble3d(s: SparkSession, dir: String): DataFrame =
    cells3(s, dir).filter(col("array_id") === "signup")
      .select(
        (col("i0") / Tile0).cast("long").as("v0"),
        (col("i1") / Tile1).cast("long").as("v1"),
        (col("i2") / Tile2).cast("long").as("v2"),
        pmod(col("i0"), lit(Tile0)).cast("long").as("l0"),
        pmod(col("i1"), lit(Tile1)).cast("long").as("l1"),
        pmod(col("i2"), lit(Tile2)).cast("long").as("l2"),
        col("value"))
      .withColumn("g0", col("v0") * Tile0 + col("l0"))
      .withColumn("g1", col("v1") * Tile1 + col("l1"))
      .withColumn("g2", col("v2") * Tile2 + col("l2"))
      .withColumn("v_key",
        concat_ws("-", col("v0"), col("v1"), col("v2")))
      .orderBy("g0", "g1", "g2")

  val a30Sql: String =
    s"""WITH $cells3Sql
       |SELECT CAST(i0 // $Tile0 AS BIGINT) AS v0,
       |  CAST(i1 // $Tile1 AS BIGINT) AS v1,
       |  CAST(i2 // $Tile2 AS BIGINT) AS v2,
       |  CAST(i0 % $Tile0 AS BIGINT) AS l0,
       |  CAST(i1 % $Tile1 AS BIGINT) AS l1,
       |  CAST(i2 % $Tile2 AS BIGINT) AS l2, value,
       |  CAST(i0 // $Tile0 AS BIGINT) * $Tile0 + CAST(i0 % $Tile0 AS BIGINT) AS g0,
       |  CAST(i1 // $Tile1 AS BIGINT) * $Tile1 + CAST(i1 % $Tile1 AS BIGINT) AS g1,
       |  CAST(i2 // $Tile2 AS BIGINT) * $Tile2 + CAST(i2 % $Tile2 AS BIGINT) AS g2,
       |  CAST(i0 // $Tile0 AS BIGINT) || '-' || CAST(i1 // $Tile1 AS BIGINT)
       |    || '-' || CAST(i2 // $Tile2 AS BIGINT) AS v_key
       |FROM cells3 WHERE array_id = 'signup' ORDER BY g0, g1, g2""".stripMargin

  // --- a31_dense_read_3d: dense n-dim subset read with fill value ---------
  // read_data is n-dimensional (base.py:225, 265-270: the byte stream
  // reshapes to the FULL slice shape in every dim); a14/a24 prove the
  // dense semantics in 2-D — this is the same contract through the
  // generalized GridSource at dims=3: one InputPartition per 3-D vgrid
  // tile, bounds on all three dims pushed down to prune tiles at plan
  // time, the (tiny, pruned) sparse slice broadcast against the generated
  // lattice, absent cells surfacing as the fill value.
  def a31DenseRead3d(s: SparkSession, dir: String): DataFrame = {
    val grid = s.read.format("graft.sources.GridSource")
      .option("dims", 3)
      .option("d0", 30).option("d1", Dim1Size).option("d2", 24)
      .option("t0", Tile0).option("t1", Tile1).option("t2", Tile2)
      .load()
      .filter(col("i0") >= 5 && col("i0") < 10 &&
              col("i1") >= 0 && col("i1") < 8 &&
              col("i2") >= 6 && col("i2") < 18)
    val slice = cells3(s, dir)
      .filter(col("array_id") === "view" &&
              col("i0") >= 5 && col("i0") < 10 &&
              col("i1") >= 0 && col("i1") < 8 &&
              col("i2") >= 6 && col("i2") < 18)
      .select("i0", "i1", "i2", "value")
    grid.join(slice, Seq("i0", "i1", "i2"), "left")
      .select(col("i0"), col("i1"), col("i2"),
              col("v0"), col("v1"), col("v2"),
              coalesce(col("value"), lit(0.0)).as("value"))
      .orderBy("i0", "i1", "i2")
  }

  val a31Sql: String =
    s"""WITH $cells3Sql,
       |grid AS (
       |  SELECT a.i0, b.i1, c.i2, a.i0 // $Tile0 AS v0, b.i1 // $Tile1 AS v1,
       |    c.i2 // $Tile2 AS v2
       |  FROM (SELECT unnest(range(5, 10)) AS i0) a
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS i1) b
       |  CROSS JOIN (SELECT unnest(range(6, 18)) AS i2) c)
       |SELECT g.i0, g.i1, g.i2, g.v0, g.v1, g.v2,
       |  COALESCE(s.value, 0.0) AS value
       |FROM grid g LEFT JOIN
       |  (SELECT i0, i1, i2, value FROM cells3
       |   WHERE array_id = 'view' AND i0 >= 5 AND i0 < 10
       |     AND i1 >= 0 AND i1 < 8 AND i2 >= 6 AND i2 < 18) s
       |  USING (i0, i1, i2)
       |ORDER BY g.i0, g.i1, g.i2""".stripMargin

  // --- a33_points_quota: per-request data-points budget planning ----------
  // The reference's third flow-control flavor (errors.py:77
  // DekerDataPointsLimitError; the runtime guard is sliceReadLimited +
  // Errors.requirePoints): a full-array read request is sized by its
  // bounding-box lattice (dim0·dim1 points, NOT populated cells — the
  // server rejects on the request's shape before materializing anything).
  // This operator is the client's planning step over the unified catalog:
  // which arrays fit one request, and how many quota-sized chunks the
  // chunked-read path needs for the rest. Catalog-scale work — one
  // partial-aggregated pass, no cell data movement.
  val PointsQuota = 256L

  def a33PointsQuota(s: SparkSession, dir: String): DataFrame =
    allCells(s, dir)
      .groupBy("coll", "array_id")
      .agg((max(col("i0")) + 1).as("dim0_size"),
           lit(Dim1Size.toLong).as("dim1_size"))
      .withColumn("points", col("dim0_size") * col("dim1_size"))
      .withColumn("quota", lit(PointsQuota))
      .withColumn("allowed", col("points") <= PointsQuota)
      .withColumn("n_chunks", expr(s"(points + ${PointsQuota - 1}) div $PointsQuota"))
      .select("coll", "array_id", "points", "quota", "allowed", "n_chunks")
      .orderBy("coll", "array_id")

  val a33Sql: String =
    s"""WITH $cellsSql, $corpusCellsSql, $intCellsSql, $floatCellsSql,
       |$allCellsSql
       |SELECT coll, array_id,
       |  (MAX(i0) + 1) * $Dim1Size AS points,
       |  CAST($PointsQuota AS BIGINT) AS quota,
       |  (MAX(i0) + 1) * $Dim1Size <= $PointsQuota AS allowed,
       |  ((MAX(i0) + 1) * $Dim1Size + ${PointsQuota - 1}) // $PointsQuota AS n_chunks
       |FROM all_cells GROUP BY coll, array_id ORDER BY coll, array_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a33_points_quota" -> (a33PointsQuota _),
    "a13_subset_chunked" -> (a13SubsetChunked _),
    "a14_dense_read" -> (a14DenseRead _),
    "a15_subset_stats" -> (a15SubsetStats _),
    "a16_label_read" -> (a16LabelRead _),
    "a32_varray_patch" -> (a32VarrayPatch _),
    "a1_grid_build" -> (a1GridBuild _),
    "a2_subset_read" -> (a2SubsetRead _),
    "a3_subset_update" -> (a3SubsetUpdate _),
    "a4_subset_clear" -> (a4SubsetClear _),
    "a5_meta_read" -> (a5MetaRead _),
    "a6_attrs_update" -> (a6AttrsUpdate _),
    "a7_get_by_primary" -> (a7GetByPrimary _),
    "a8_list_arrays" -> (a8ListArrays _),
    "a9_delete_by_vid" -> (a9DeleteByVid _),
    "a10_varray_assemble" -> (a10VarrayAssemble _),
    "a11_hashring_place" -> (a11HashringPlace _),
    "a12_ring_rebalance" -> (a12RingRebalance _),
    "a17_read_replicas" -> (a17ReadReplicas _),
    "a18_rate_limit" -> (a18RateLimit _),
    "a19_list_collections" -> (a19ListCollections _),
    "a20_collection_delete" -> (a20CollectionDelete _),
    "a21_subset_read_3d" -> (a21SubsetRead3d _),
    "a22_strided_read" -> (a22StridedRead _),
    "a23_leader_redirect" -> (a23LeaderRedirect _),
    "a24_strided_dense_read" -> (a24StridedDenseRead _),
    "a25_array_combine" -> (a25ArrayCombine _),
    "a26_array_coarsen" -> (a26ArrayCoarsen _),
    "a27_int_cells" -> (a27IntCells _),
    "a28_soft_delete" -> (a28SoftDelete _),
    "a29_float_cells" -> (a29FloatCells _),
    "a30_varray_3d" -> (a30VarrayAssemble3d _),
    "a31_dense_read_3d" -> (a31DenseRead3d _),
  )

  // --- a32_varray_patch: vgrid write-path decomposition -------------------
  // The INVERSE of a10's assemble and the reference's VArray update
  // contract (varray_adapter.py update → per-tile sub-array writes):
  // a patch given in GLOBAL virtual-array coordinates decomposes into one
  // local patch per intersecting vgrid tile — local bounds are pure
  // arithmetic (patch ∩ tile, rebased by v·T), each per-tile patch routes
  // to its owning node via the ring (utils/requests.py: writes go to the
  // owner), and the report carries the affected cell count + patched
  // checksum per tile. One partial-agg'd groupBy over the pruned patch
  // region — the scan reads only the patch bounds (pushed filters), the
  // decomposition itself is shuffle-free arithmetic on the tile key.
  // (Cells are the sparse observed set, so n_cells counts EXISTING cells
  // in the intersection — the dense-fill write path is a14/a31's
  // GridSource contract composed with this decomposition.)
  val P0Lo = 7L; val P0Hi = 22L; val P1Lo = 3L; val P1Hi = 9L
  val PatchVal = 2.5

  def a32VarrayPatch(s: SparkSession, dir: String): DataFrame =
    cellsStored(s, dir)
      .filter(col("array_id") === "signup" &&
        col("i0").between(P0Lo, P0Hi) && col("i1").between(P1Lo, P1Hi))
      .groupBy((col("i0") / Tile0).cast("long").as("v0"),
               (col("i1") / Tile1).cast("long").as("v1"))
      .agg(count(lit(1)).as("n_cells"))
      .withColumn("hash_key",
        concat(lit("signup/"), col("v0"), lit("-"), col("v1")))
      .withColumn("node", placeExpr(HashRing.current, "hash_key"))
      .withColumn("l0_lo",
        greatest(lit(P0Lo), col("v0") * Tile0) - col("v0") * Tile0)
      .withColumn("l0_hi",
        least(lit(P0Hi), col("v0") * Tile0 + (Tile0 - 1)) - col("v0") * Tile0)
      .withColumn("l1_lo",
        greatest(lit(P1Lo), col("v1") * Tile1) - col("v1") * Tile1)
      .withColumn("l1_hi",
        least(lit(P1Hi), col("v1") * Tile1 + (Tile1 - 1)) - col("v1") * Tile1)
      .withColumn("patched_sum", col("n_cells").cast("double") * lit(PatchVal))
      .select("v0", "v1", "hash_key", "node", "l0_lo", "l0_hi",
              "l1_lo", "l1_hi", "n_cells", "patched_sum")
      .orderBy("v0", "v1")

  val a32Sql: String =
    s"""WITH $cellsSql,
       |ring(k, node) AS (VALUES ${HashRing.current.sqlValues}),
       |dec AS (
       |  SELECT CAST(i0 // $Tile0 AS BIGINT) AS v0,
       |    CAST(i1 // $Tile1 AS BIGINT) AS v1, COUNT(*) AS n_cells
       |  FROM cells
       |  WHERE array_id = 'signup'
       |    AND i0 BETWEEN $P0Lo AND $P0Hi AND i1 BETWEEN $P1Lo AND $P1Hi
       |  GROUP BY 1, 2),
       |keyed AS (
       |  SELECT v0, v1, n_cells,
       |    'signup/' || v0 || '-' || v1 AS hash_key
       |  FROM dec)
       |SELECT v0, v1, hash_key,
       |  (SELECT node FROM ring WHERE k = ${duckPlace(HashRing.current, "ring")}) AS node,
       |  GREATEST($P0Lo, v0 * $Tile0) - v0 * $Tile0 AS l0_lo,
       |  LEAST($P0Hi, v0 * $Tile0 + ${Tile0 - 1}) - v0 * $Tile0 AS l0_hi,
       |  GREATEST($P1Lo, v1 * $Tile1) - v1 * $Tile1 AS l1_lo,
       |  LEAST($P1Hi, v1 * $Tile1 + ${Tile1 - 1}) - v1 * $Tile1 AS l1_hi,
       |  n_cells, CAST(n_cells AS DOUBLE) * $PatchVal AS patched_sum
       |FROM keyed ORDER BY v0, v1""".stripMargin

  val oracles: Map[String, String] = Map(
    "a33_points_quota" -> a33Sql,
    "a32_varray_patch" -> a32Sql,
    "a13_subset_chunked" -> a13Sql,
    "a14_dense_read" -> a14Sql,
    "a15_subset_stats" -> a15Sql,
    "a16_label_read" -> a16Sql,
    "a1_grid_build" -> a1Sql,
    "a2_subset_read" -> a2Sql,
    "a3_subset_update" -> a3Sql,
    "a4_subset_clear" -> a4Sql,
    "a5_meta_read" -> a5Sql,
    "a6_attrs_update" -> a6Sql,
    "a7_get_by_primary" -> a7Sql,
    "a8_list_arrays" -> a8Sql,
    "a9_delete_by_vid" -> a9Sql,
    "a10_varray_assemble" -> a10Sql,
    "a11_hashring_place" -> a11Sql,
    "a12_ring_rebalance" -> a12Sql,
    "a17_read_replicas" -> a17Sql,
    "a18_rate_limit" -> a18Sql,
    "a19_list_collections" -> a19Sql,
    "a20_collection_delete" -> a20Sql,
    "a21_subset_read_3d" -> a21Sql,
    "a22_strided_read" -> a22Sql,
    "a23_leader_redirect" -> a23Sql,
    "a24_strided_dense_read" -> a24Sql,
    "a25_array_combine" -> a25Sql,
    "a26_array_coarsen" -> a26Sql,
    "a27_int_cells" -> a27Sql,
    "a28_soft_delete" -> a28Sql,
    "a29_float_cells" -> a29Sql,
    "a30_varray_3d" -> a30Sql,
    "a31_dense_read_3d" -> a31Sql,
  )
}

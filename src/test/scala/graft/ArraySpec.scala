package graft

import graft.arrays.{ArrayModel, ArrayOps, HashRing}
import org.apache.spark.sql.functions._

class ArraySpec extends SparkSpec {

  test("every array op runs non-empty at sf0.001") {
    ArrayOps.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("hash ring: weighted vnode counts match reference formula") {
    // hash_ring.py:38 factor = floor(40*N*w/totalW); 3 keys per vnode
    val r = HashRing.current // nodes a,b,c with c weighted 2 (total 4)
    val perNode = r.ring.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perNode("node-a") == math.floor(40.0 * 3 * 1 / 4).toInt * 3)
    assert(perNode("node-c") == math.floor(40.0 * 3 * 2 / 4).toInt * 3)
  }

  test("hash ring: deterministic and ketama-distributed") {
    val r = HashRing.current
    val keys = (0 until 1000).map(i => s"key-$i")
    val assign = keys.map(r.getNode)
    assert(assign == keys.map(r.getNode)) // deterministic
    val counts = assign.groupBy(identity).view.mapValues(_.size).toMap
    // weighted node should get roughly 2x traffic; all nodes nonzero
    assert(counts.values.forall(_ > 0))
    assert(counts("node-c") > counts("node-a"))
  }

  test("hash ring: adding a node only moves keys, never reshuffles all") {
    val keys = (0 until 1000).map(i => s"key-$i")
    val before = keys.map(HashRing.current.getNode)
    val after = keys.map(HashRing.target.getNode)
    val moved = before.zip(after).count { case (b, a) => b != a }
    // consistent hashing: only ~1/(N+1) of keys move to the new node
    assert(moved < 500, s"moved $moved of 1000 — not consistent hashing")
    // and every moved key moved TO the new node or due to ring perturbation;
    // the new node must own a nonzero share
    assert(after.contains("node-d"))
  }

  test("spark placement expression agrees with driver-side Scala ring") {
    val df = ArrayOps.a11HashringPlace(spark, sf)
    val rows = df.collect()
    rows.foreach { r =>
      val key = r.getAs[String]("hash_key")
      assert(r.getAs[String]("node") == HashRing.current.getNode(key),
        s"spark placement diverges from scala ring for $key")
    }
  }

  test("RingLookup native expression: codegen path agrees with Scala ring at volume") {
    import graft.plans.RingLookup
    val df = spark.range(2000)
      .withColumn("k", concat(lit("key-"), col("id")))
      .withColumn("h", expr(HashRing.sparkGenKey("k")))
      .withColumn("node", RingLookup.place(col("h"), HashRing.current))
    // whole-stage codegen must cover the projection (no interpreted
    // fallback): "*(n)" marks WholeStageCodegen stages in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"ring_lookup projection fell out of codegen:\n$plan")
    df.collect().foreach { r =>
      assert(r.getAs[String]("node") == HashRing.current.getNode(r.getAs[String]("k")))
    }
  }

  test("a17 replica lists: owner first, all distinct, codegen'd at volume") {
    val rows = ArrayOps.a17ReadReplicas(spark, sf).collect()
    rows.foreach { r =>
      val key = r.getAs[String]("hash_key")
      val reps = Seq("replica_1", "replica_2", "replica_3").map(r.getAs[String])
      assert(reps.head == HashRing.current.getNode(key), "owner must lead the list")
      assert(reps.distinct == reps, s"replica list has duplicates: $reps")
      assert(reps.toSet == HashRing.currentNodes.toSet,
        "3 replicas over a 3-node ring must cover every node")
    }
    // the RingReplicas expression stays inside whole-stage codegen
    import graft.plans.RingReplicas
    val df = spark.range(500)
      .withColumn("k", concat(lit("key-"), col("id")))
      .withColumn("reps", RingReplicas.replicas(
        graft.functions.GenKey(col("k")), HashRing.current, 3))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"ring_replicas fell out of codegen:\n$plan")
    df.collect().foreach { r =>
      assert(r.getSeq[String](2).head ==
        HashRing.current.getNode(r.getAs[String]("k")))
    }
  }

  test("a18 rate limit: per-day cap honored, throttle counts consistent") {
    val rows = ArrayOps.a18RateLimit(spark, sf).collect()
    assert(rows.nonEmpty, "test data should contain bursty users")
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(2) < r.getLong(1),
        "throttled must be a proper subset of requests")
    }
    // cross-check one user against a direct per-day count
    val u = rows.head.getLong(0)
    val perDay = Tables.events(spark, sf)
      .filter(col("user_id") === u)
      .groupBy(expr("unix_micros(ts) div 86400000000")).count()
      .collect().map(_.getLong(1))
    val expectThrottled = perDay.map(n => math.max(0L, n - ArrayOps.RateCap)).sum
    assert(rows.head.getLong(2) == expectThrottled)
  }

  test("a19/a20 collection lifecycle: iterate sees all four, delete drops only corpus") {
    val colls = ArrayOps.a19ListCollections(spark, sf).collect()
    assert(colls.map(_.getString(0)).toSeq ==
      Seq(ArrayModel.CorpusColl, ArrayModel.FloatColl, ArrayModel.IntColl,
          ArrayModel.Coll))
    // the unified catalog carries each collection's declared dtype
    assert(colls.map(r => r.getString(0) -> r.getString(4)).toMap ==
      Map(ArrayModel.CorpusColl -> "float64", ArrayModel.FloatColl -> "float32",
          ArrayModel.IntColl -> "int64", ArrayModel.Coll -> "float64"))
    colls.foreach(r => assert(r.getLong(1) > 0 && r.getLong(2) > 0))
    val survivors = ArrayOps.a20CollectionDelete(spark, sf).collect()
    assert(survivors.nonEmpty)
    val survivorColls = survivors.map(_.getString(0)).toSet
    assert(!survivorColls.contains(ArrayModel.CorpusColl),
      "deleted collection must not survive")
    assert(survivorColls == Set(ArrayModel.Coll, ArrayModel.IntColl,
      ArrayModel.FloatColl), "undeleted collections must all survive")
  }

  test("patch then read-back returns patched values inside bounds only") {
    val c = ArrayModel.cells(spark, sf)
    val patched = ArrayOps.patch(c, "click", (10L, 20L), (4L, 12L), lit(-1.0))
    val in = patched.filter(col("array_id") === "click" &&
      col("i0") >= 10 && col("i0") < 20 && col("i1") >= 4 && col("i1") < 12)
    val out = patched.filter(col("array_id") === "click" &&
      !(col("i0") >= 10 && col("i0") < 20 && col("i1") >= 4 && col("i1") < 12))
    assert(in.filter(col("value") =!= -1.0).count() == 0)
    assert(out.filter(col("value") === -1.0).count() == 0)
  }

  test("chunked slice read equals direct slice read; bad bounds raise typed errors") {
    val c = ArrayModel.cells(spark, sf)
    val direct = ArrayOps.sliceRead(c, "view", (5L, 15L), (2L, 10L))
    val chunked = ArrayOps.chunkedSliceRead(c, "view", (5L, 15L), (2L, 10L), maxCells = 16)
    assert(chunked.except(direct).count() == 0 && direct.except(chunked).count() == 0)
    intercept[graft.GraftBoundsError] {
      ArrayOps.sliceRead(c, "view", (15L, 5L), (2L, 10L))
    }
    intercept[graft.GraftBoundsError] {
      ArrayOps.chunkedSliceRead(c, "view", (-1L, 5L), (2L, 10L))
    }
  }

  test("error surface: timeout, healthcheck, cluster id-filter, points quota") {
    import graft.arrays.ArrayOps.Dim
    val c = ArrayModel.cells(spark, sf)
    // points quota: the lattice (not the populated cells) is what the
    // server sizes — 10×8 = 80 points pass a quota of 80, fail 79; the
    // error carries the reference's limiter fields
    assert(ArrayOps.sliceReadLimited(c, "view", Dim(5, 15), Dim(2, 10), 80).count() ==
      ArrayOps.sliceRead(c, "view", (5L, 15L), (2L, 10L)).count())
    val pe = intercept[graft.GraftDataPointsLimitError] {
      ArrayOps.sliceReadLimited(c, "view", Dim(5, 15), Dim(2, 10), 79)
    }
    assert(pe.limit.contains(79L) && pe.remaining.contains(0L))
    // a strided request is sized by SELECTED points: 5×8 = 40 under the
    // same bounds fits the quota the dense request failed
    assert(ArrayOps.sliceReadLimited(c, "view", Dim(5, 15, 2), Dim(2, 10), 79)
      .count() >= 0)
    // cluster-mode id filter forbidden (the collection has primary
    // attributes); primary-attribute addressing (a7) and single-node id
    // lookups stay allowed
    intercept[graft.GraftIdFilterForbiddenError] {
      ArrayOps.metaLookup(spark, sf, byId = Some("click"), clusterMode = true)
    }
    assert(ArrayOps.metaLookup(spark, sf, byId = Some("click"), clusterMode = false)
      .count() == 1)
    assert(ArrayOps.metaLookup(spark, sf, byId = None, clusterMode = true)
      .count() > 0)
    // healthcheck: green on a real store, typed error naming the missing
    // tables on a broken one
    graft.Errors.healthcheck(spark, sf)
    val he = intercept[graft.GraftHealthcheckError] {
      graft.Errors.healthcheck(spark, "/nonexistent-store")
    }
    assert(he.getMessage.contains("documents"))
    // timeout: a within-budget action passes; a deliberately slow action
    // is CANCELLED (not just abandoned) and surfaces as the typed 504
    // analogue
    import spark.implicits._
    assert(graft.Errors.withTimeout(spark, 60000L) {
      spark.range(10).count()
    } == 10L)
    intercept[graft.GraftTimeoutError] {
      graft.Errors.withTimeout(spark, 300L) {
        spark.range(1, 33, 1, 32).mapPartitions { it =>
          Thread.sleep(30000); it
        }.count()
      }
    }
  }

  test("varray assemble round-trips global coords") {
    val df = ArrayOps.a10VarrayAssemble(spark, sf)
    assert(df.filter(col("g0") =!= col("v0") * ArrayModel.Tile0 + col("l0")).count() == 0)
    // reassembled coords must match the original cells slice
    val orig = ArrayModel.cells(spark, sf).filter(col("array_id") === "signup")
      .select(col("i0").as("g0"), col("i1").as("g1"), col("value"))
    assert(df.select("g0", "g1", "value").except(orig).count() == 0)
  }

  test("3-D varray assemble round-trips global coords and keys all three") {
    val df = ArrayOps.a30VarrayAssemble3d(spark, sf)
    Seq(("g0", "v0", "l0", ArrayModel.Tile0), ("g1", "v1", "l1", ArrayModel.Tile1),
        ("g2", "v2", "l2", ArrayModel.Tile2)).foreach { case (g, v, l, t) =>
      assert(df.filter(col(g) =!= col(v) * t + col(l)).count() == 0,
        s"dim $g must round-trip v*T+l")
    }
    // reassembled coords must match the original 3-D cells slice
    val orig = ArrayOps.cells3(spark, sf).filter(col("array_id") === "signup")
      .select(col("i0").as("g0"), col("i1").as("g1"), col("i2").as("g2"),
        col("value"))
    assert(df.select("g0", "g1", "g2", "value").except(orig).count() == 0)
    // the primary-attribute key joins EVERY v_position coordinate
    // (utils/hashing.py:17's "-".join over the n-tuple)
    assert(df.filter(col("v_key") =!= concat_ws("-", col("v0"), col("v1"),
      col("v2"))).count() == 0)
  }

  test("strided slice: phase anchored at lo; chunked==direct; patch-back strided cells only") {
    import ArrayOps.Dim
    val c = ArrayModel.cells(spark, sf)
    val strided = ArrayOps.sliceRead(c, "click", Dim(5, 25, 2), Dim(0, 16, 3))
    val rows = strided.select("i0", "i1").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(0) - 5) % 2 == 0 && r.getLong(1) % 3 == 0,
        s"off-stride cell (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // flow-controlled strided read must equal the direct strided read
    val chunked = ArrayOps.chunkedSliceRead(c, "click", Dim(5, 25, 2), Dim(0, 16, 3), 8)
    assert(chunked.except(strided).count() == 0 && strided.except(chunked).count() == 0)
    // patch the strided subset, read back: every on-stride cell patched,
    // no off-stride cell touched
    val patched = ArrayOps.patch(c, "click", Dim(5, 25, 2), Dim(0, 16, 3), lit(-7.0))
    val onStride = ArrayOps.sliceRead(patched, "click", Dim(5, 25, 2), Dim(0, 16, 3))
    assert(onStride.filter(col("value") =!= -7.0).count() == 0)
    val offStride = patched.filter(col("array_id") === "click").except(onStride)
    assert(offStride.filter(col("value") === -7.0).count() == 0)
    intercept[graft.GraftBoundsError] {
      ArrayOps.sliceRead(c, "click", Dim(0, 5, 0), Dim(0, 5))
    }
  }

  test("vgrid tiles are truly 2-D: v1 is a real coordinate, key joins all coords") {
    val t = ArrayModel.tiles(spark, sf)
    assert(t.select("v1").distinct().count() > 1, "v1 must vary (not lit(0))")
    t.collect().foreach { r =>
      assert(r.getAs[String]("hash_key") ==
        s"${r.getAs[String]("vid")}/${r.getAs[Long]("v0")}-${r.getAs[Long]("v1")}")
    }
  }

  test("a32 patch decomposition: tiles partition the patch region exactly") {
    import ArrayModel.{Tile0, Tile1}
    import ArrayOps.{P0Lo, P0Hi, P1Lo, P1Hi, PatchVal}
    val rows = ArrayOps.a32VarrayPatch(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-tile local bounds: inside the tile, non-empty, and their global
    // image is exactly patch ∩ tile
    rows.foreach { r =>
      val (v0, v1) = (r.getLong(0), r.getLong(1))
      val (l0lo, l0hi, l1lo, l1hi) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(l0lo >= 0 && l0hi < Tile0 && l0lo <= l0hi)
      assert(l1lo >= 0 && l1hi < Tile1 && l1lo <= l1hi)
      assert(v0 * Tile0 + l0lo == math.max(P0Lo, v0 * Tile0))
      assert(v0 * Tile0 + l0hi == math.min(P0Hi, v0 * Tile0 + Tile0 - 1))
      assert(v1 * Tile1 + l1lo == math.max(P1Lo, v1 * Tile1))
      assert(v1 * Tile1 + l1hi == math.min(P1Hi, v1 * Tile1 + Tile1 - 1))
      assert(r.getDouble(9) == r.getLong(8) * PatchVal)
      assert(r.getString(2) == s"signup/$v0-$v1")
      assert(HashRing.currentNodes.contains(r.getString(3)))
    }
    // cell-count conservation: per-tile counts sum to the direct count of
    // existing cells inside the global patch region
    val direct = ArrayModel.cellsStored(spark, sf)
      .filter(col("array_id") === "signup" &&
        col("i0").between(P0Lo, P0Hi) && col("i1").between(P1Lo, P1Hi))
      .count()
    assert(rows.map(_.getLong(8)).sum == direct)
    // no tile listed twice
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("slice read prunes partitions and pushes dim filters at the scan") {
    // a2 reads the materialized store: array_id is a directory-level
    // PartitionFilter, the dim bounds are row-group PushedFilters
    val plan = ArrayOps.a2SubsetRead(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("array_id"),
      s"expected partition pruning on array_id:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThanOrEqual(i0,5)"),
      s"expected dim-bound pushdown into scan:\n$plan")
  }
}

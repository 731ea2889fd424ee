package graft

import graft.arrays.{ArrayModel, ArrayOps, HashRing}
import graft.sources.ArrayStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class StoreAndExtensionsSpec extends SparkSpec {

  test("ArrayStore: pruned layout slice read equals model slice read") {
    val path = java.nio.file.Files.createTempDirectory("graft-store").toString
    ArrayStore.materialize(ArrayModel.cells(spark, sf), path)
    val store = ArrayStore.open(spark, path)
    val got = ArrayStore.sliceRead(store, "weather", "click", (5L, 15L), (2L, 10L))
      .select("array_id", "i0", "i1", "value")
    val expected = ArrayOps.sliceRead(ArrayModel.cells(spark, sf), "click", (5L, 15L), (2L, 10L))
      .select("array_id", "i0", "i1", "value")
    assert(got.except(expected).count() == 0 && expected.except(got).count() == 0)
  }

  test("ArrayStore: array_id prunes directories, dim bounds push to scan") {
    val path = java.nio.file.Files.createTempDirectory("graft-store2").toString
    ArrayStore.materialize(ArrayModel.cells(spark, sf), path)
    val plan = ArrayStore.sliceRead(ArrayStore.open(spark, path),
      "weather", "click", (5L, 15L), (2L, 10L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("array_id"),
      s"expected directory pruning on array_id:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(i0,5)"),
      s"expected row-group filters on i0:\n$plan")
  }

  test("GraftExtensions: SQL users get graft_gen_key / graft_ring_place") {
    // extensions apply at session construction: build a sibling session
    // over the same SparkContext with the extensions class wired in
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sess = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .getOrCreate()
    SparkSession.setDefaultSession(spark)
    SparkSession.setActiveSession(spark)
    val rows = sess.sql(
      "SELECT graft_ring_place(graft_gen_key('click/0-0')) AS node, " +
      "graft_gen_key('click/0-0') AS h").collect()
    assert(rows.head.getAs[String]("node") == HashRing.current.getNode("click/0-0"))
    assert(rows.head.getAs[Long]("h") == HashRing.current.genKey("click/0-0"))
  }

  test("native GenKey equals the composed md5/conv form") {
    val df = spark.range(500)
      .withColumn("k", concat(lit("key-"), col("id")))
      .withColumn("h_native", graft.functions.GenKey(col("k")))
      .withColumn("h_composed", expr(HashRing.sparkGenKey("k")))
    assert(df.filter(col("h_native") =!= col("h_composed")).count() == 0)
  }
}

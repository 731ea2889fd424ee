package graft

import org.apache.spark.sql.functions._

/** BenchTier's 5× derivation is the evidence base for the committed
  * larger-SF artifact (BENCH_SF05.json) — if the generator is wrong the
  * tier's exponents measure the generator, not the plans. Proven here at
  * mult=2 / sf0.001: exact replication factors, cross-replica key
  * disjointness, the events nanos round-trip, and the two behavioral
  * contracts the tier's headline set leans on (linear agg growth,
  * pruned reads untouched by inventory growth).
  */
class BenchTierSpec extends SparkSpec {

  private lazy val tierDir = BenchTier.generate(spark, sf, 2)

  test("tier tables replicate exactly: facts 2x, bounded dims fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")) {
      val n0 = spark.read.parquet(s"$sf/$t.parquet").count()
      val n1 = spark.read.parquet(s"$tierDir/$t.parquet").count()
      assert(n1 == 2 * n0, s"$t: $n1 != 2*$n0")
    }
    for (t <- Seq("nation", "region")) {
      val n0 = spark.read.parquet(s"$sf/$t.parquet").count()
      val n1 = spark.read.parquet(s"$tierDir/$t.parquet").count()
      assert(n1 == n0, s"$t must stay fixed: $n1 != $n0")
    }
  }

  test("replica keys are disjoint — per-replica join structure mirrors the original") {
    val orders = Tables.orders(spark, tierDir)
    assert(orders.select("o_orderkey").distinct.count() ==
      2 * Tables.orders(spark, sf).select("o_orderkey").distinct.count())
    // every lineitem still joins an order: replication offset order keys
    // consistently on both sides
    val dangling = Tables.lineitem(spark, tierDir)
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count()
    assert(dangling == 0, s"$dangling lineitem rows lost their order")
  }

  test("events round-trip Tables.events and the array inventory doubles") {
    val ev = Tables.events(spark, tierDir)
    assert(ev.filter(col("ts").isNull).count() == 0)
    assert(ev.select("event_type").distinct.count() ==
      2 * Tables.events(spark, sf).select("event_type").distinct.count())
  }

  test("linear contract: q1 measures per group exactly double at mult=2") {
    val main = SparkEntry.queries("q1_agg")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val tier = SparkEntry.queries("q1_agg")(spark, tierDir)
      .select("l_returnflag", "l_linestatus", "sum_qty").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(tier.keySet == main.keySet, "replication must not invent groups")
    for ((k, v) <- main)
      assert(math.abs(tier(k) - 2 * v) < 1e-6, s"$k: ${tier(k)} != 2*$v")
  }

  test("pruning contract: a25's two-array read is untouched by a 2x inventory") {
    val main = SparkEntry.queries("a25_array_combine")(spark, sf).collect()
    val tier = SparkEntry.queries("a25_array_combine")(spark, tierDir).collect()
    assert(tier.toSeq == main.toSeq,
      "a25 addresses fixed arrays; replica arrays (suffixed types) must not leak in")
  }
}

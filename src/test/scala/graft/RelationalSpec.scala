package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("driver contract: entry() returns rows and every query has an oracle or rows-only note") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 46)
  }

  test("every relational query runs non-empty at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q1 partial sums equal whole-table sums (agg correctness)") {
    val df = Relational.q1Agg(spark, sf)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00"))).count()
    assert(total == expected)
  }

  test("q3 top-k is sorted descending by revenue") {
    val rev = Relational.q3Topk(spark, sf).select("revenue")
      .collect().map(_.getDouble(0))
    assert(rev.sameElements(rev.sortBy(-_)))
    assert(rev.length == 10)
  }

  test("q4 exists + q13 anti partition the domain") {
    // semi-join(filter) + anti-join(filter) = all rows
    val o = Tables.orders(spark, sf)
    val big = Tables.lineitem(spark, sf).filter(col("l_quantity") >= 48).select("l_orderkey")
    val semi = o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi").count()
    val anti = o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti").count()
    assert(semi + anti == o.count())
  }

  test("q10 as-of join: every click precedes its purchase") {
    val e = Tables.events(spark, sf).select("event_id", "ts")
    val res = Relational.q10AsofJoin(spark, sf)
    val joined = res
      .join(e.withColumnRenamed("ts", "p_ts"), res("purchase_id") === e("event_id")).drop("event_id")
      .join(e.withColumnRenamed("ts", "c_ts"), res("click_id") === e("event_id"))
    assert(joined.filter(col("c_ts") >= col("p_ts")).count() == 0)
  }

  test("q15 salted agg equals plain agg") {
    val salted = Relational.q15SkewAgg(spark, sf)
    val plain = Tables.events(spark, sf).groupBy("event_type")
      .agg(Det.dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
    assert(salted.select("event_type", "total_value", "n_events")
      .except(plain).count() == 0)
  }

  test("q16 session counts are internally consistent") {
    val df = Relational.q16Sessionize(spark, sf)
    assert(df.filter(col("n_sessions") =!= col("n_sessions_check")).count() == 0)
  }

  test("broadcast joins chosen for dim tables in q5 plan") {
    val plan = Relational.q5Multijoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q23 exact median matches a JVM-side sort for every group") {
    val got = Relational.q23Median(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byType = Tables.events(spark, sf).select("event_type", "value").collect()
      .groupBy(_.getString(0))
    byType.foreach { case (t, rows) =>
      val v = rows.map(_.getDouble(1)).sorted
      val n = v.length
      val expect = (v((n - 1) / 2) + v(n / 2)) / 2
      assert(got(t) == expect, s"median mismatch for $t")
    }
  }

  test("q21 grouping sets: marginals and grand total reconcile") {
    val rows = Relational.q21GroupingSets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val grand = rows(("ALL", "ALL"))
    val statusMarginal = rows.collect { case ((s, "ALL"), n) if s != "ALL" => n }.sum
    val priorityMarginal = rows.collect { case (("ALL", p), n) if p != "ALL" => n }.sum
    val cross = rows.collect { case ((s, p), n) if s != "ALL" && p != "ALL" => n }.sum
    assert(statusMarginal == grand && priorityMarginal == grand && cross == grand)
    // one Expand + one shuffle, not four scans
    val plan = Relational.q21GroupingSets(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets should compile to Expand")
  }

  test("q24 funnel: stage counts match a JVM-side ordered replay") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    def firstTs(evs: Array[(Long, String, Long)], tpe: String, after: Long): Option[Long] = {
      val c = evs.filter(e => e._2 == tpe && e._3 > after).map(_._3)
      if (c.isEmpty) None else Some(c.min)
    }
    var (nViewed, nClicked, nPurchased) = (0L, 0L, 0L)
    byUser.foreach { case (_, evs) =>
      firstTs(evs, "view", Long.MinValue).foreach { tv =>
        nViewed += 1
        firstTs(evs, "click", tv).foreach { tc =>
          nClicked += 1
          if (firstTs(evs, "purchase", tc).isDefined) nPurchased += 1
        }
      }
    }
    val r = Relational.q24ConversionFunnel(spark, sf).collect().head
    assert(r.getLong(0) == byUser.size)
    assert(r.getLong(1) == nViewed, "n_viewed")
    assert(r.getLong(2) == nClicked, "n_clicked_after")
    assert(r.getLong(3) == nPurchased, "n_purchased_after")
    // the funnel shrinks monotonically
    assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= r.getLong(3))
    assert(r.getDouble(5) == nPurchased.toDouble / byUser.size)
  }

  test("q22 range window: trailing frame contains the row itself and only <=6-day-older peers") {
    val rows = Relational.q22RangeWindow(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(3) >= 1))
    // cross-check one customer against a direct quadratic computation
    val cust = rows.head.getLong(0)
    val mine = rows.filter(_.getLong(0) == cust)
    val days = mine.map(_.getLong(2))
    mine.foreach { r =>
      val d = r.getLong(2)
      val expectN = days.count(x => x >= d - 6 && x <= d)
      assert(r.getLong(3) == expectN, s"window count mismatch at day $d")
    }
  }
}

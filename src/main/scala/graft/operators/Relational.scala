package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2-B relational core: the query engine the array model sits on.
  *
  * Every query here is written Spark-first — declarative DataFrame plans so
  * Catalyst does pushdown/pruning/join-selection — with explicit
  * `broadcast()` on dimension tables (at 100 TB the fact side never fits a
  * shuffle-both-sides join; the dims always fit a broadcast). Float
  * aggregates go through [[graft.Det]] so the DuckDB oracle is bit-exact.
  * Each query carries its DuckDB oracle SQL right next to it.
  */
object Relational {

  // --- q1_agg: TPC-H-Q1-style pricing summary -----------------------------
  // One shuffle (partial+final hash agg); filter pushed to parquet scan.
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlDsum("l_quantity")} AS sum_qty,
       |  ${Det.sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${Det.sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
       |  ${Det.sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |  ${Det.sqlDavg("l_quantity")} AS avg_qty,
       |  ${Det.sqlDavg("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- q2_join_filter: dim-fact join, broadcast the BOUNDED dims ----------
  // customer is NOT hinted: it grows linearly with SF (150k rows per SF
  // unit), so a pinned broadcast is the unrecoverable OOM at 100 TB (§5
  // doctrine). AQE still picks a broadcast join at bench scale from the
  // measured size; nation/region (25/5 rows, bounded by construction)
  // keep the hint.
  def q2JoinFilter(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
           Det.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("n_name")
  }

  val q2Sql: String =
    s"""SELECT n_name, COUNT(*) AS n_orders,
       |  ${Det.sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- q3_topk: join + agg + top-k (TakeOrderedAndProject, no full sort) --
  def q3Topk(s: SparkSession, dir: String): DataFrame = {
    // Aggregation pushed BELOW the join (Catalyst has no agg-pushdown
    // rule, so it's done in the plan): revenue is additive per order and
    // Det.dsum is an exact decimal sum (associative), so pre-aggregating
    // lineitem by l_orderkey is bit-identical to grouping after the join
    // — while the join's lineitem side collapses from every line row to
    // one partial-sum row per orderkey, map-side-combined before the
    // exchange. The 20x shuffle audit flagged the old plan the moment
    // AQE's designed broadcast->SMJ transition exposed the full-table
    // join bytes (ratio 149 at the step, exactly linear on both sides);
    // this plan shuffles ~order-cardinality bytes in ALL regimes, so at
    // 100 TB the SMJ exchanges partial sums, never raw line items. The
    // agg's hash partitioning on l_orderkey is reused by the join: no
    // extra exchange vs the old plan at small SF either.
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val rev = l.groupBy(col("l_orderkey"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
    rev.join(o, rev("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       |  ${Det.sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // --- q4_exists: EXISTS semi-join (left-semi hash join) ------------------
  def q4Exists(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48)
      .select("l_orderkey")
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q5_multijoin: 5-way snowflake join, one shuffle on the fact --------
  def q5Multijoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    // customer unhinted (SF-scaling side — §5 doctrine); AQE broadcasts it
    // at runtime while it fits, falls back to shuffle when it doesn't.
    // nation/region stay pinned: bounded by construction.
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
           count(lit(1)).as("n_lineitems"))
      .orderBy("r_name", "n_name")
  }

  val q5Sql: String =
    s"""SELECT r_name, n_name,
       |  ${Det.sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
       |  COUNT(*) AS n_lineitems
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // --- q6_filter_agg: selective scan, full pushdown, zero shuffle ---------
  def q6FilterAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
              col("l_quantity") < 24)
      .agg(Det.dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    s"""SELECT ${Det.sqlDsum("l_extendedprice * l_discount", 6)} AS revenue,
       |  COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  // --- q7_window: ranking window per group, single shuffle ----------------
  def q7Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("c_mktsegment", "rnk", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rnk")
  }

  val q7Sql: String =
    """SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) t
      |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin

  // --- q8_rollup: hierarchical aggregation --------------------------------
  def q8Rollup(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           Det.dsum(col("o_totalprice")).as("total_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n_orders"), col("total_price"))
      .orderBy("status", "priority")
  }

  val q8Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n_orders,
       |  ${Det.sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  // --- q9_distinct: exact + sanity-checked approx count-distinct ----------
  // approx_count_distinct (HLL++) is deterministic for fixed data; we assert
  // it lands within 5% of exact and emit that check as a boolean so the
  // oracle (which has no HLL++ with identical params) can verify it.
  def q9Distinct(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
           approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"))
      .select(col("event_type"), col("n_users"),
              (abs(col("n_users_approx") - col("n_users")) <=
                col("n_users") * 0.05).as("approx_within_5pct"))
      .orderBy("event_type")
  }

  val q9Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      |  TRUE AS approx_within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- q10_asof_join: latest-click-before-purchase ------------------------
  // Spark-first as-of: union + last(ignoreNulls) over a window — one shuffle
  // on user_id, no N×M candidate blowup (the naive range join the oracle
  // runs is O(clicks×purchases) per user; this is O(n log n)).
  def q10AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
              col("event_id").as("click_id"),
              lit(null).cast("long").as("purchase_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
              lit(null).cast("long").as("click_id"),
              col("event_id").as("purchase_id"))
    // purchases sort before clicks at equal ts, so an equal-ts click falls
    // outside the purchase's frame => strict "click before purchase" (the
    // oracle's c.ts < p.ts). click_id as the final key makes equal-ts
    // click ties deterministic (largest id wins, = the oracle's arg_max
    // by (ts, event_id)).
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("click_id").isNotNull.cast("int"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("purchase_id").isNotNull && col("last_click").isNotNull)
      .select(col("user_id"), col("purchase_id"), col("last_click").as("click_id"))
      .orderBy("purchase_id")
  }

  val q10Sql: String =
    """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |  MAX({'ts': c.ts, 'id': c.event_id}).id AS click_id
      |FROM events p
      |JOIN events c ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND c.ts < p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.user_id, p.event_id
      |ORDER BY purchase_id""".stripMargin

  // --- q11_range_join: band join against broadcast interval table ---------
  private val bands: Seq[(String, Int, Int)] = Seq(
    ("B0_low", 0, 20000), ("B1_mid", 20000, 40000), ("B2_high", 40000, 60000),
    ("B3_xhigh", 60000, 80000), ("B4_top", 80000, 125000))

  def q11RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = bands.toDF("band", "lo", "hi")
    Tables.lineitem(s, dir)
      .join(broadcast(b),
            col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_items"),
           Det.dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("band")
  }

  val q11Sql: String = {
    val vals = bands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")
    s"""SELECT band, COUNT(*) AS n_items,
       |  ${Det.sqlDsum("l_extendedprice")} AS total_price
       |FROM lineitem
       |JOIN (VALUES $vals) v(band, lo, hi)
       |  ON l_extendedprice >= lo AND l_extendedprice < hi
       |GROUP BY band ORDER BY band""".stripMargin
  }

  // --- q12_pivot: day × event_type matrix ---------------------------------
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q12Pivot(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", eventTypes)
      .agg(Det.dsum(col("value")))
      .orderBy("day")
  }

  val q12Sql: String = {
    val cols = eventTypes.map { t =>
      s"  ${Det.sqlDsum(s"CASE WHEN event_type = '$t' THEN value END")} AS \"$t\""
    }.mkString(",\n")
    s"""SELECT CAST(ts AS DATE) AS day,
       |$cols
       |FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin
  }

  // --- q13_antijoin: customers with no big order (left-anti hash join) ----
  def q13Antijoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           Det.dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  val q13Sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
       |  ${Det.sqlDsum("c_acctbal")} AS total_acctbal
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --- q14_union_dedup: UNION + dedup (hash-agg distinct) -----------------
  def q14UnionDedup(s: SparkSession, dir: String): DataFrame = {
    val hot = Tables.events(s, dir).filter(col("value") > 400)
      .select(col("user_id").as("id"))
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      .select(pmod(col("o_custkey"), lit(150)).cast("long").as("id"))
    hot.unionByName(big).distinct()
      .agg(count(lit(1)).as("n_ids"),
           min(col("id")).as("min_id"), max(col("id")).as("max_id"))
  }

  val q14Sql: String =
    """SELECT COUNT(*) AS n_ids, MIN(id) AS min_id, MAX(id) AS max_id FROM (
      |  SELECT user_id AS id FROM events WHERE value > 400
      |  UNION
      |  SELECT ((o_custkey % 150) + 150) % 150 AS id FROM orders WHERE o_totalprice > 400000
      |) t""".stripMargin

  // --- q15_skew_agg: salted two-stage aggregation -------------------------
  // Same result as a plain groupBy, but the first stage fans hot keys over
  // 8 salt buckets so no single reducer owns a whole hot key at scale.
  // Decimal partials keep the two-stage sum exact.
  def q15SkewAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.events(s, dir)
    val partial = e
      .withColumn("salt", pmod(col("user_id"), lit(8)))
      .groupBy("event_type", "salt")
      .agg(sum(col("value").cast(DecimalType(18, 4))).as("psum"),
           count(lit(1)).as("pcnt"))
    partial.groupBy("event_type")
      .agg(sum(col("psum")).cast("double").as("total_value"),
           sum(col("pcnt")).as("n_events"))
      .orderBy("event_type")
  }

  val q15Sql: String =
    s"""SELECT event_type, ${Det.sqlDsum("value")} AS total_value,
       |  COUNT(*) AS n_events
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- q16_sessionize: 30-min-gap sessions, one shuffle by user -----------
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts")
    val cum = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(cum))
    e.groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("sess_events"))
      .groupBy("user_id")
      .agg(max(col("sess_id")).as("n_sessions"),
           max(col("sess_events")).as("max_session_events"),
           count(lit(1)).cast("long").as("n_sessions_check"))
      .orderBy("user_id")
  }

  val q16Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), sess AS (
      |  SELECT user_id,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM flagged
      |), per_sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS sess_events
      |  FROM sess GROUP BY user_id, sess_id
      |)
      |SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
      |  MAX(sess_events) AS max_session_events,
      |  COUNT(*) AS n_sessions_check
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- q17_json_props: semi-structured extraction from the props column ---
  // ONE from_json with an explicit schema parses the payload once per row
  // into a struct (the SURVEY §2 scale path — a pipeline extracting more
  // props keys later widens the schema, not the parse count); Catalyst's
  // json-expression optimization prunes the parsed schema to the fields
  // actually read, and CollapseProject keeps the parse in its own
  // projection below the aggregate.
  def q17JsonProps(s: SparkSession, dir: String): DataFrame = {
    val propsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "k", org.apache.spark.sql.types.LongType)))
    Tables.events(s, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
           Det.dsum(col("value")).as("total_value"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("k_bucket")
  }

  val q17Sql: String =
    s"""SELECT ((CAST(json_extract(props, '$$.k') AS BIGINT) % 10) + 10) % 10 AS k_bucket,
       |  COUNT(*) AS n_events,
       |  ${Det.sqlDsum("value")} AS total_value,
       |  MIN(CAST(json_extract(props, '$$.k') AS BIGINT)) AS min_k,
       |  MAX(CAST(json_extract(props, '$$.k') AS BIGINT)) AS max_k
       |FROM events
       |GROUP BY ((CAST(json_extract(props, '$$.k') AS BIGINT) % 10) + 10) % 10
       |ORDER BY k_bucket""".stripMargin

  // --- q18_part_supplier: snowflake over the remaining dims ---------------
  def q18PartSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
    val sup = Tables.supplier(s, dir)
    // part/supplier unhinted: both scale linearly with SF, so the pinned
    // broadcast violated the §5 bounded-by-construction rule (part's PROMO
    // filter thins it ~5x but does not bound it). AQE converts both joins
    // to broadcast at bench scale from measured post-filter sizes.
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .groupBy("p_brand", "s_name")
      .agg(count(lit(1)).as("n_items"),
           Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy("p_brand", "s_name")
  }

  val q18Sql: String =
    s"""SELECT p_brand, s_name, COUNT(*) AS n_items,
       |  ${Det.sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE p_type = 'PROMO'
       |GROUP BY p_brand, s_name ORDER BY p_brand, s_name""".stripMargin

  // --- q19_setops: INTERSECT / EXCEPT ------------------------------------
  def q19Setops(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def users(t: String) = e.filter(col("event_type") === t).select("user_id")
    val both = users("click").intersect(users("purchase"))
    val clickOnly = users("click").except(users("purchase"))
    both.agg(count(lit(1)).as("n_click_and_purchase"))
      .crossJoin(clickOnly.agg(count(lit(1)).as("n_click_only")))
  }

  val q19Sql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM (
      |     SELECT user_id FROM events WHERE event_type = 'click'
      |     INTERSECT
      |     SELECT user_id FROM events WHERE event_type = 'purchase'))
      |    AS n_click_and_purchase,
      |  (SELECT COUNT(*) FROM (
      |     SELECT user_id FROM events WHERE event_type = 'click'
      |     EXCEPT
      |     SELECT user_id FROM events WHERE event_type = 'purchase'))
      |    AS n_click_only""".stripMargin

  // --- q20_above_avg: correlated-subquery semantics -----------------------
  // "orders above their customer's average order value": the correlated
  // scalar subquery the oracle runs becomes, Spark-first, a single window
  // average over the customer partition — one shuffle, no per-row re-scan.
  def q20AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables.orders(s, dir)
      .withColumn("cust_sum",
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4))).over(w))
      .withColumn("cust_n", count(lit(1)).over(w))
      .withColumn("cust_avg", col("cust_sum").cast("double") / col("cust_n"))
      .filter(col("o_totalprice") > col("cust_avg"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_above_avg"),
           Det.dsum(col("o_totalprice")).as("total_above"))
      .orderBy("o_orderpriority")
  }

  val q20Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_above_avg,
       |  ${Det.sqlDsum("o_totalprice")} AS total_above
       |FROM orders o
       |WHERE o_totalprice > (
       |  SELECT ${Det.sqlDavg("o_totalprice")}
       |  FROM orders i WHERE i.o_custkey = o.o_custkey)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q21_grouping_sets: arbitrary multi-level aggregation ---------------
  // ROLLUP (q8) only covers prefix hierarchies; GROUPING SETS computes an
  // arbitrary lattice — here both one-dimensional marginals plus the full
  // cross and the grand total — in ONE pass over the fact (Expand + single
  // shuffle), where naive SQL would scan four times.
  def q21GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           Det.dsum(col("o_totalprice")).as("total_price"),
           grouping(col("o_orderstatus")).as("g_status"),
           grouping(col("o_orderpriority")).as("g_priority"))
      // GROUPING(), not COALESCE-on-value: a genuine NULL group value and
      // a subtotal row must not collide on the output key
      .select(when(col("g_status") === 1, lit("ALL"))
                .otherwise(col("o_orderstatus")).as("status"),
              when(col("g_priority") === 1, lit("ALL"))
                .otherwise(col("o_orderpriority")).as("priority"),
              col("n_orders"), col("total_price"))
      .orderBy("status", "priority")
  }

  val q21Sql: String =
    s"""SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
       |            ELSE o_orderstatus END AS status,
       |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
       |       ELSE o_orderpriority END AS priority,
       |  COUNT(*) AS n_orders,
       |  ${Det.sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
       |                        (o_orderstatus), (o_orderpriority), ())
       |ORDER BY status, priority""".stripMargin

  // --- q22_range_window: time-range moving aggregate ----------------------
  // 7-day trailing revenue per customer: a RANGE frame over a day index —
  // one shuffle on the partition key, the frame scan is a sliding pointer
  // over the sorted partition (no self-join / no per-row rescan, which is
  // how the equivalent correlated query would execute).
  def q22RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("day_idx")
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("day_idx",
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).cast("long"))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("mov_rev",
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double"))
      .filter(col("o_custkey") < 200)
      .select("o_custkey", "o_orderkey", "day_idx", "n_in_window", "mov_rev")
      .orderBy("o_custkey", "day_idx", "o_orderkey")
  }

  val q22Sql: String =
    """SELECT o_custkey, o_orderkey, day_idx, n_in_window, mov_rev FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx,
      |    COUNT(*) OVER w AS n_in_window,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS mov_rev
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      |WHERE o_custkey < 200
      |ORDER BY o_custkey, day_idx, o_orderkey""".stripMargin

  // --- q23_median: exact positional median per group ----------------------
  // Exact median = the middle value(s) by position, not an interpolated
  // quantile — engines disagree on interpolated quantiles but positional
  // selection is bit-exact: rank rows, keep positions (n+1)/2 and
  // (n+2)/2 (equal when n is odd), average them (a 1-or-2-element sum —
  // IEEE addition of two values is commutative, so order-free). One
  // window shuffle per group. At 100 TB the approximate path is
  // percentile_approx over the same plan; this is the exact path.
  def q23Median(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n + 2) div 2"))
      .groupBy("event_type")
      .agg((sum(col("value")) / count(lit(1))).as("median_value"),
           max(col("n")).as("n_events"))
      .orderBy("event_type")
  }

  val q23Sql: String =
    """SELECT event_type, SUM(value) / COUNT(*) AS median_value,
      |  MAX(n) AS n_events
      |FROM (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Registry consumed by SparkEntry. */
  // --- q24_conversion_funnel: ordered-stage event funnel ------------------
  // The staple event-analytics query the core still lacked: how many
  // users progressed view → click → purchase IN ORDER (each stage's
  // event strictly after the previous stage's first occurrence).
  // Expressed as three shrinking aggregations — first view per user,
  // first click after that view, first purchase after that click — each
  // one partial-agg'd groupBy over a pushed-down event_type filter, each
  // stage's output a fraction of the previous (the joins are
  // small-side-shrinking, planner-chosen). One summary row: stage
  // populations + conversion rates. At 100 TB this beats the
  // sessionize-then-scan form: no per-user event list is ever
  // materialized, and each stage scans only its event type's pruned
  // rows.
  def q24ConversionFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def firstAfter(tpe: String, prev: DataFrame, prevTs: String, outTs: String) =
      e.filter(col("event_type") === tpe)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min(col("ts")).as(outTs))
    val viewed = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("tv"))
    val clicked = firstAfter("click", viewed, "tv", "tc")
    val purchased = firstAfter("purchase", clicked, "tc", "tp")
    val users = e.select("user_id").distinct()
    users.agg(count(lit(1)).as("n_users"))
      .join(viewed.agg(count(lit(1)).as("n_viewed")))
      .join(clicked.agg(count(lit(1)).as("n_clicked_after")))
      .join(purchased.agg(count(lit(1)).as("n_purchased_after")))
      .withColumn("view_rate",
        col("n_viewed").cast("double") / col("n_users").cast("double"))
      .withColumn("funnel_rate",
        col("n_purchased_after").cast("double") / col("n_users").cast("double"))
      .select("n_users", "n_viewed", "n_clicked_after", "n_purchased_after",
              "view_rate", "funnel_rate")
  }

  val q24Sql: String =
    """WITH viewed AS (
      |  SELECT user_id, MIN(ts) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |clicked AS (
      |  SELECT e.user_id, MIN(e.ts) AS tc FROM events e
      |  JOIN viewed v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.tv
      |  GROUP BY e.user_id),
      |purchased AS (
      |  SELECT e.user_id, MIN(e.ts) AS tp FROM events e
      |  JOIN clicked c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.tc
      |  GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
      |  (SELECT COUNT(*) FROM viewed) AS n_viewed,
      |  (SELECT COUNT(*) FROM clicked) AS n_clicked_after,
      |  (SELECT COUNT(*) FROM purchased) AS n_purchased_after,
      |  CAST((SELECT COUNT(*) FROM viewed) AS DOUBLE) /
      |    (SELECT COUNT(DISTINCT user_id) FROM events) AS view_rate,
      |  CAST((SELECT COUNT(*) FROM purchased) AS DOUBLE) /
      |    (SELECT COUNT(DISTINCT user_id) FROM events) AS funnel_rate""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_conversion_funnel" -> (q24ConversionFunnel _),
    "q1_agg" -> (q1Agg _),
    "q2_join_filter" -> (q2JoinFilter _),
    "q3_topk" -> (q3Topk _),
    "q4_exists" -> (q4Exists _),
    "q5_multijoin" -> (q5Multijoin _),
    "q6_filter_agg" -> (q6FilterAgg _),
    "q7_window" -> (q7Window _),
    "q8_rollup" -> (q8Rollup _),
    "q9_distinct" -> (q9Distinct _),
    "q10_asof_join" -> (q10AsofJoin _),
    "q11_range_join" -> (q11RangeJoin _),
    "q12_pivot" -> (q12Pivot _),
    "q13_antijoin" -> (q13Antijoin _),
    "q14_union_dedup" -> (q14UnionDedup _),
    "q15_skew_agg" -> (q15SkewAgg _),
    "q16_sessionize" -> (q16Sessionize _),
    "q17_json_props" -> (q17JsonProps _),
    "q18_part_supplier" -> (q18PartSupplier _),
    "q19_setops" -> (q19Setops _),
    "q20_above_avg" -> (q20AboveAvg _),
    "q21_grouping_sets" -> (q21GroupingSets _),
    "q22_range_window" -> (q22RangeWindow _),
    "q23_median" -> (q23Median _),
  )

  val oracles: Map[String, String] = Map(
    "q24_conversion_funnel" -> q24Sql,
    "q1_agg" -> q1Sql,
    "q2_join_filter" -> q2Sql,
    "q3_topk" -> q3Sql,
    "q4_exists" -> q4Sql,
    "q5_multijoin" -> q5Sql,
    "q6_filter_agg" -> q6Sql,
    "q7_window" -> q7Sql,
    "q8_rollup" -> q8Sql,
    "q9_distinct" -> q9Sql,
    "q10_asof_join" -> q10Sql,
    "q11_range_join" -> q11Sql,
    "q12_pivot" -> q12Sql,
    "q13_antijoin" -> q13Sql,
    "q14_union_dedup" -> q14Sql,
    "q15_skew_agg" -> q15Sql,
    "q16_sessionize" -> q16Sql,
    "q17_json_props" -> q17Sql,
    "q18_part_supplier" -> q18Sql,
    "q19_setops" -> q19Sql,
    "q20_above_avg" -> q20Sql,
    "q21_grouping_sets" -> q21Sql,
    "q22_range_window" -> q22Sql,
    "q23_median" -> q23Sql,
  )
}

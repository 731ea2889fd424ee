package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-time larger-SF bench tier (round-8 item: at sf0.1 nearly every op
  * sits on the ~0.2s per-query overhead floor, so plan-cost differences
  * are invisible and growth exponents read low). This main derives a
  * deterministic 5× corpus from sf0.1 — effectively sf0.5 — across ALL
  * tables (not just the documents/embeddings pair ScaleProbe replicates),
  * times a headline subset spanning every family with the bench's proven
  * protocol (GC barrier + untimed warm + min-of-4), and writes
  * BENCH_SF05.json with per-op tier times and growth exponents
  * (t ~ data^e). `runMain graft.BenchTier [mult] [mainSfDir]`.
  *
  * Replication is structure-preserving and key-disjoint, so the workload
  * grows LINEARLY by construction and a super-linear exponent indicts the
  * PLAN, not the generator:
  *  - TPC-H facts/dims: replica i offsets every join key by i·10⁹
  *    (orderkey/custkey/partkey/suppkey) — per-replica join fan-outs
  *    mirror the original exactly, cross-replica joins match nothing.
  *    nation/region stay fixed: bounded by construction (25/5 rows), the
  *    realistic dims-grow-slower shape.
  *  - events: event_id/user_id offset by i·10⁹ and event_type suffixed
  *    "x{i}" — the derived array store (ArrayModel: one array per
  *    event_type) grows 5× in ARRAY COUNT with per-array density
  *    unchanged, so catalog-scale ops grow while pruned point reads
  *    (a25/a26 address one array) must stay FLAT — both shapes are in
  *    the headline set deliberately; a pruned read that grows with the
  *    inventory is a broken pruning story. ts is copied in its on-disk
  *    encoding (raw nanos long or native timestamp, whichever the source
  *    generation used) so the tier dir round-trips through
  *    Tables.normalizeTs unchanged.
  *  - documents/embeddings: ScaleProbe.generate's replica-local
  *    transforms (suffixed tokens / ±1-sign-flipped dims) — shingle and
  *    cosine affinity stays within replicas, candidates never cross.
  */
object BenchTier {

  /** Headline ops: every family, weighted toward the inventory's most
    * expensive, plus the two deliberately-flat pruned array reads.
    */
  val Headline: Seq[String] = Seq(
    // relational: the big joins/aggs/distinct/sessionize
    "q1_agg", "q3_topk", "q4_exists", "q5_multijoin", "q8_rollup",
    "q9_distinct", "q16_sessionize",
    // arrays: full-inventory build + catalog agg (grow) vs pruned
    // two-array combine + one-array coarsen (must stay flat)
    "a1_grid_build", "a19_list_collections", "a25_array_combine",
    "a26_array_coarsen",
    // dedup/decontamination pipeline (d16 rides d4's kernel — its tier
    // exponent proves the shared-scan claim, not just the sf0.1 timing)
    "d2_minhash_lsh", "d4_ngram_jaccard", "d16_containment_dedup",
    "d5_embed_dedup",
    "d7_dup_groups", "d9_decontaminate", "d12_bloom_decontaminate",
    "d15_curation_funnel",
    // similarity, text, multimodal (m1/m3 exercise the real P6 decode
    // path — codec cost must scale linearly with the corpus), streaming
    "s1_knn_brute", "s3_ivf_ann", "s8_pq_ann", "t5_top_terms",
    "t9_rarity_score",
    "m1_multimodal", "m3_resize", "m4_feature_extract",
    "st7_stream_decontaminate")

  private val KeyOff = 1000000000L

  /** Replicate a TPC-H-ish table: offset `keys` by i·10⁹ per replica. */
  private def repKeys(df: DataFrame, mult: Int, keys: Seq[String]): DataFrame =
    (0 until mult).map { i =>
      if (i == 0) df
      else keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + i * KeyOff))
    }.reduce(_ unionByName _)

  /** Extend ScaleProbe's documents+embeddings tier dir with the TPC-H
    * tables and events, all mult×.
    */
  def generate(s: SparkSession, mainDir: String, mult: Int): String =
    generate(s, mainDir, mult, None)

  /** As above; `target` writes to a caller-owned persistent dir (see
    * ScaleProbe.generate).
    */
  def generate(s: SparkSession, mainDir: String, mult: Int,
               target: Option[String]): String = {
    val dir = ScaleProbe.generate(s, mainDir, mult, target)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write(repKeys(Tables.customer(s, mainDir), mult, Seq("c_custkey")), "customer")
    write(repKeys(Tables.supplier(s, mainDir), mult, Seq("s_suppkey")), "supplier")
    write(repKeys(Tables.part(s, mainDir), mult, Seq("p_partkey")), "part")
    write(repKeys(Tables.orders(s, mainDir), mult, Seq("o_orderkey", "o_custkey")), "orders")
    write(repKeys(Tables.lineitem(s, mainDir), mult,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(Tables.nation(s, mainDir), "nation")
    write(Tables.region(s, mainDir), "region")
    // raw read in the on-disk encoding (no timestamp normalization) so the
    // written column round-trips through Tables.normalizeTs identically
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = s.read.parquet(s"$mainDir/events.parquet")
    val evReps = (0 until mult).map { i =>
      if (i == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + i * KeyOff)
        .withColumn("user_id", col("user_id") + i * KeyOff)
        .withColumn("event_type", concat(col("event_type"), lit(s"x$i")))
    }
    write(evReps.reduce(_ unionByName _), "events")
    dir
  }

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(5)
    val mainDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // session warm-up, as in Bench
    val tierDir = generate(spark, mainDir, mult)
    // materialize both array stores for both dirs OUTSIDE the timings —
    // one-time ETL of the persistent physical layout, not a query cost
    // (same exclusion Bench makes)
    Seq(mainDir, tierDir).foreach { d =>
      graft.arrays.ArrayModel.cellsStored(spark, d).count()
      graft.arrays.ArrayModel.cellsBucketed(spark, d).count()
    }
    val Runs = 4
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      System.gc()
      fn(spark, dir).count() // untimed warm: codegen/JIT/store-first-touch
      (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val loadStart = Bench.load1()
    val entries = Headline.map { name =>
      val fn = SparkEntry.queries(name)
      val tMain = time(fn, mainDir)
      val tTier = time(fn, tierDir)
      val e = math.log(tTier / tMain) / math.log(mult.toDouble)
      println(f"[benchtier] $name t_sf01=$tMain%.3f t_tier=$tTier%.3f e=$e%.2f")
      (name, tMain, tTier, e)
    }
    val f3 = (v: Double) => Bench.fnum(v, 3)
    val opsJson = entries.map { case (n, tm, tt, e) =>
      s""""$n":{"t_sf01":${f3(tm)},"t_tier":${f3(tt)},"exponent":${Bench.fnum(e, 2)}}"""
    }.mkString("{", ",", "}")
    // the gate: linear-by-construction corpus, so e substantially past 1
    // means the plan does super-linear work; 1.3 leaves room for the
    // shrinking (but at 5× not yet gone) share of fixed per-query cost
    val superlinear = entries.collect { case (n, _, _, e) if e > 1.3 => "\"" + n + "\"" }
    val (outFile, tierName) = mult match {
      case 5  => ("BENCH_SF05.json", "sf0.5")
      case 10 => ("BENCH_SF1.json", "sf1")
      case m  => (s"BENCH_TIER${m}x.json", s"${m}x sf0.1")
    }
    val json =
      s"""{"tier":"$tierName (deterministic ${mult}x of sf0.1, all tables)","mult":$mult,""" +
        s""""main_sf":"$mainDir","timing":"min of $Runs after warm + GC barrier",""" +
        s""""total_sf01":${f3(entries.map(_._2).sum)},"total_tier":${f3(entries.map(_._3).sum)},""" +
        s""""superlinear":${superlinear.mkString("[", ",", "]")},""" +
        s""""load1_start":${Bench.load1Json(loadStart)},"load1_end":${Bench.load1Json(Bench.load1())},""" +
        s""""ops":$opsJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}

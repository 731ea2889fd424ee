package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-inventory tier bench (round-9 stretch): the driver-shape bench —
  * ALL of SparkEntry.queries, Bench's exact GC-barrier + untimed-warm +
  * min-of-4 protocol — run against a REAL on-disk sf0.5 corpus
  * (BenchTier.generate's key-disjoint 5× of sf0.1, written to parquet, so
  * every scan/prune/pushdown path is the production file path, not an
  * in-memory union). BENCH_SF05 times 28 headline ops; this times all
  * 111, with in-run sf0.1 counterparts for per-op growth exponents, so a
  * scale problem hiding in a non-headline op has nowhere to hide. Writes
  * BENCH_FULL_SF05.json. `runMain graft.BenchFullTier [mult] [mainSfDir]`.
  */
object BenchFullTier {
  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(5)
    val mainDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // session warm-up, as in Bench
    val tierDir = BenchTier.generate(spark, mainDir, mult)
    // one-time ETL of the persistent array-store layout for both dirs,
    // outside the timings (same exclusion Bench makes)
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
    // round 10: st8 is no longer skipped — its whitelist admits the tier
    // generator's "x<replica>"-suffixed types under the base type's quota
    // (Streams.St8BasePattern), so all 111 ops time on the tier files.
    val loadStart = Bench.load1()
    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val tMain = time(fn, mainDir)
      val tTier = time(fn, tierDir)
      val e = math.log(tTier / tMain) / math.log(mult.toDouble)
      println(f"[benchfulltier] $name t_sf01=$tMain%.3f t_tier=$tTier%.3f e=$e%.2f")
      (name, tMain, tTier, e)
    }
    val f3 = (v: Double) => Bench.fnum(v, 3)
    val opsJson = entries.map { case (n, tm, tt, e) =>
      s""""$n":{"t_sf01":${f3(tm)},"t_tier":${f3(tt)},"exponent":${Bench.fnum(e, 2)}}"""
    }.mkString("{", ",", "}")
    // same gate as BenchTier: linear-by-construction corpus, so e
    // substantially past 1 indicts the plan; 1.3 leaves room for the
    // shrinking fixed per-query share
    val superlinear = entries.collect { case (n, _, _, e) if e > 1.3 => "\"" + n + "\"" }
    val json =
      s"""{"tier":"full ${SparkEntry.queries.size}-op inventory at ${mult}x sf0.1, real parquet files","mult":$mult,""" +
        s""""main_sf":"$mainDir","timing":"min of $Runs after warm + GC barrier",""" +
        s""""total_sf01":${f3(entries.map(_._2).sum)},"total_tier":${f3(entries.map(_._3).sum)},""" +
        s""""superlinear":${superlinear.mkString("[", ",", "]")},""" +
        s""""skipped":{},""" +
        s""""load1_start":${Bench.load1Json(loadStart)},"load1_end":${Bench.load1Json(Bench.load1())},${Bench.gitStamp},""" +
        s""""ops":$opsJson}"""
    val outFile = mult match {
      case 5  => "BENCH_FULL_SF05.json"
      case 10 => "BENCH_FULL_SF1.json"
      case m  => s"BENCH_FULL_TIER${m}x.json"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}

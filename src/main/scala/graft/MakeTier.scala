package graft

/** Materialize the BenchTier scale corpus (all tables, mult× sf0.1,
  * key-disjoint replicas) into a caller-owned directory that survives
  * this JVM — so `graft.Verify <dir> <out>` plus the DuckDB compare can
  * gate the tier files end-to-end (round-10 item: the adaptive-k paths
  * — d5 k=6, s2 k=5 at 5× — become driver-gate-proven on real files,
  * not just spec-proven). `runMain graft.MakeTier <outDir> [mult]
  * [mainSfDir]`.
  */
object MakeTier {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val mult = args.lift(1).map(_.toInt).getOrElse(5)
    val mainDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = BenchTier.generate(spark, mainDir, mult, Some(outDir))
    println(s"[maketier] wrote ${mult}x tier corpus of $mainDir to $dir")
    spark.stop()
  }
}

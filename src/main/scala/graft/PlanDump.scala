package graft
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dump every declared query's static `explain("formatted")` text to
  * one file per op: `runMain graft.PlanDump <outDir> [suffix] [names]`.
  * Writes `<outDir>/<op>_<suffix>.txt` (suffix defaults to "before").
  * Session config matches the bench contract (GraftSession at
  * SPARK_GRAFT_CPUS over SPARK_GRAFT_SF_DIR) so Exchange counts / join
  * strategies in the files are the ones the bench executes — modulo
  * AQE, which re-plans at runtime; PlanCheck shows the AQE-final
  * strategies where the distinction matters. Each file is stamped with
  * the git SHA it was generated from (same provenance rule as every
  * other round-14 artifact).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.PlanDump <outDir> [suffix] [name,name,...]")
      sys.exit(2)
    }
    val outDir = args(0)
    val suffix = args.lift(1).getOrElse("before")
    val subset = args.lift(2).map(_.split(",").toSet)
    // an unknown name in the subset silently produced an empty output dir
    // (round-14 ADVICE): fail loudly instead
    subset.foreach { set =>
      val unknown = set -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"PlanDump: unknown quer${if (unknown.size == 1) "y" else "ies"} " +
          unknown.toSeq.sorted.mkString(", "))
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val header = s"== $name @ $sfDir local[$cpus] ${Bench.gitStamp}\n"
        val text = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          (header + text).getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
      }
    spark.stop()
  }
}

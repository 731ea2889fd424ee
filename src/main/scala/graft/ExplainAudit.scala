package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    // optional trailing integer arg: lines per plan (default 40)
    val (names0, lines) = args.lastOption.flatMap(_.toIntOption) match {
      case Some(n) => (args.dropRight(1).toSeq, n)
      case None => (args.toSeq, 40)
    }
    val names = if (names0.nonEmpty) names0
      else Seq("q1_agg", "q5_multijoin", "q6_filter_agg", "a2_subset_read", "d2_minhash_lsh", "q10_asof_join")
    for (name <- names) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator.take(lines).mkString("\n"))
    }
    spark.stop()
  }
}

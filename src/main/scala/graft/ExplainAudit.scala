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
    for (name <- (if (args.nonEmpty) args.toSeq else Seq("q1_agg", "q5_multijoin", "q6_filter_agg", "a2_subset_read", "d2_minhash_lsh", "q10_asof_join"))) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}

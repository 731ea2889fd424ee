package graft

import org.apache.spark.sql.execution.{SparkPlan, QueryExecution}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** One-off executed-plan inspector with per-node metrics: runs each named
  * operator, then walks the FINAL adaptive plan printing every physical
  * node with its non-zero metrics (spill size, peak memory, rows). This is
  * the tool for adjudicating a spill signature: the executed `Sort`'s
  * output attribute list shows exactly which columns ride in the sort rows.
  * `runMain graft.ProbeExec <dir> <name>...`
  */
object ProbeExec {
  def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: QueryStageExec => finalPlan(q.plan)
    case other => other
  }

  def walk(p: SparkPlan, depth: Int): Unit = {
    val mets = p.metrics.toSeq
      .map { case (k, m) => (k, m.value) }
      .filter { case (_, v) => v > 0 }
      .sortBy(-_._2)
      .map { case (k, v) =>
        if (k.toLowerCase.contains("size") || k.toLowerCase.contains("memory") ||
            k.toLowerCase.contains("bytes") || k.toLowerCase.contains("spill"))
          f"$k=${v / 1048576.0}%.1fMB"
        else s"$k=$v"
      }
    val out = p.output.map(_.name).mkString(",")
    println(("  " * depth) + p.nodeName +
      s" [out: ${out.take(160)}]" +
      (if (mets.nonEmpty) mets.mkString(" {", " ", "}") else ""))
    p.children.foreach(c => walk(finalPlan(c), depth + 1))
    // inner adaptive subqueries (broadcast exchanges under reuse) are skipped
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, dir)
      // Execute THIS df's own physical plan (not a derived count() plan) so
      // the walked nodes carry the real execution metrics.
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      val n = qe.executedPlan.execute().count()
      println(f"===== $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs =====")
      walk(finalPlan(qe.executedPlan), 0)
    }
    spark.stop()
  }
}

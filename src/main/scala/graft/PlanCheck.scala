package graft

/** Post-execution adaptive-plan inspector: runs each named operator at
  * sf0.1 and reports the FINAL (AQE re-optimized) join strategies —
  * `ExplainAudit` shows the static plan, which under AQE is not what
  * executes. Used to prove the unpinned sub-linear joins (t5 df, t9
  * vocab, d10 labels, d11 rep, d12 verify, d15 contam/keepers) recover
  * broadcast at runtime. `runMain graft.PlanCheck <name>...`.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      println(s"[plancheck] $name final-plan SMJ=$smj BHJ=$bhj")
    }
    spark.stop()
  }
}

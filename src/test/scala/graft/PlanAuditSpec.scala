package graft

/** Whole-inventory physical-plan audit: invariants that must hold for
  * EVERY operator, because at 100 TB a plan regression (an accidental
  * non-broadcast cartesian product, an interpreted Python-style UDF
  * fallback) is a cluster outage, not a slow test.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose driver-side iteration (localCheckpoint) executes jobs
    * during planning — audited by their building blocks instead.
    */
  private val iterative = Set("d7_dup_groups")

  test("no operator plans a non-broadcast cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => iterative(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        // CartesianProductExec = both sides shuffled row-by-row, O(n*m)
        // across the cluster; broadcast nested-loop over a tiny side
        // (BroadcastNestedLoopJoin) is the acceptable form
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"non-broadcast cartesian products in: ${offenders.mkString(", ")}")
  }

  test("no operator falls back to interpreted ScalaUDF in its plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => iterative(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("UDF(")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"ScalaUDF (interpreted, codegen-opaque) used by: ${offenders.mkString(", ")}")
  }
}

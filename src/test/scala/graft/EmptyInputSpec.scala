package graft

/** Every operator must *plan and execute* against empty inputs — at scale,
  * empty partitions and empty filter results are the common case, and a
  * head-on-empty or reduce-on-empty bug takes down a whole job.
  */
class EmptyInputSpec extends SparkSpec {

  /** Schema-preserving empty copies of every table. */
  lazy val emptyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    // events goes through the nanos path: preserve the raw nanos schema
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("every operator runs (0 rows, no exception) on fully empty inputs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"operators failing on empty input:\n${failures.mkString("\n")}")
  }
}

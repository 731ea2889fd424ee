package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame builder; `oracleSql` carries the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ arrays.ArrayOps.queries ++
      pipeline.TextAnalysis.queries ++ pipeline.Dedup.queries ++
      pipeline.Similarity.queries ++ pipeline.Multimodal.queries ++
      streaming.Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ arrays.ArrayOps.oracles ++
      pipeline.TextAnalysis.oracles ++ pipeline.Dedup.oracles ++
      pipeline.Similarity.oracles ++ pipeline.Multimodal.oracles ++
      streaming.Streams.oracles
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical storage layout for the cell model — the piece that makes the
  * reference's `read_data(array, bounds)` (base.py:225) a *pruned scan*
  * instead of a query at 100 TB.
  *
  * Layout: parquet partitioned by `(coll, array_id)` (directory-level
  * pruning: a bounds read of one array touches exactly one directory) and
  * sorted within partitions by `(i0, i1)` (row-group zone maps: the dim
  * filters skip row groups before decoding). One file per array partition
  * keeps the file count linear in arrays, not in executors.
  *
  * On a cluster the same layout holds with `bucketBy` on array_id for
  * shuffle-free re-reads; directory partitioning is the portable core.
  */
object ArrayStore {

  /** Write cells in the pruned layout. */
  def materialize(cells: DataFrame, path: String): Unit =
    cells
      .repartition(col("coll"), col("array_id"))
      .sortWithinPartitions("i0", "i1")
      .write.mode("overwrite")
      .partitionBy("coll", "array_id")
      .parquet(path)

  def open(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Bounds read against the materialized layout: array_id becomes a
    * PartitionFilter (directory pruning), i0/i1 become PushedFilters
    * (row-group skipping). Same semantics as ArrayOps.sliceRead.
    */
  def sliceRead(store: DataFrame, coll: String, arrayId: String,
                b0: (Long, Long), b1: (Long, Long)): DataFrame =
    store.filter(col("coll") === coll && col("array_id") === arrayId &&
      col("i0") >= b0._1 && col("i0") < b0._2 &&
      col("i1") >= b1._1 && col("i1") < b1._2)

  /** The write path of `update(array, bounds, data)` (base.py:272-303) at
    * scale: copy-on-write of ONLY the affected array's partition via
    * dynamic partition overwrite — every other array's files are untouched
    * (no full-table rewrite, no read-modify-write of unrelated data).
    */
  def patchPartition(s: SparkSession, path: String, coll: String,
                     arrayId: String, b0: (Long, Long), b1: (Long, Long),
                     data: org.apache.spark.sql.Column): Unit = {
    graft.Errors.requireBounds(b0, b1)
    val one = open(s, path)
      .filter(col("coll") === coll && col("array_id") === arrayId)
    val inBounds = col("i0") >= b0._1 && col("i0") < b0._2 &&
      col("i1") >= b1._1 && col("i1") < b1._2
    val patched = one.withColumn("value", when(inBounds, data).otherwise(col("value")))
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try patched
      .repartition(col("coll"), col("array_id"))
      .sortWithinPartitions("i0", "i1")
      .write.mode("overwrite").partitionBy("coll", "array_id").parquet(path)
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}

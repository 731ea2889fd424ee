package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session entry point: the configuration graft expects on a
  * real cluster, with the 100 TB rationale for each knob. Local runs
  * (Verify/Bench/tests) override master and shuffle partitions.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = 0): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      // UTC everywhere: every timestamp literal/grouping in the engine and
      // its oracles assumes it; a TZ-floating session silently changes
      // which rows a date filter selects.
      .config("spark.sql.session.timeZone", "UTC")
      // AQE re-plans with real sizes: coalesces the small shuffles our
      // catalog/meta ops produce and converts to broadcast when a filtered
      // fact side collapses below the threshold.
      .config("spark.sql.adaptive.enabled", "true")
      // Hot array_ids / hot LSH buckets are expected in real corpora; AQE
      // skew split complements the explicit salting pattern (q15).
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Catalyst-planned exchanges START at 512 partitions and AQE
      // coalesces DOWN to ~64 MB targets — the standard cluster recipe.
      // With initialPartitionNum left at the session default (32 here),
      // every planner-inserted shuffle was pinned to 32 regardless of
      // data: the round-13 tier320 audit caught d4/d16's pair
      // aggregation + size joins sorting 140M-row streams through
      // 32 tasks (27 GB of sort/agg spill, numTasksFallBacked=32).
      // Small shuffles coalesce to fewer-than-32 tasks, so the sf0.01
      // gate plans only get cheaper; explicit sized repartitions
      // (d5/d4's kernel exchanges) are user-specified and unaffected.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // 128 MiB scan splits: big enough to amortize parquet footers &
      // codec startup, small enough that a single slice-read task fits
      // comfortably in executor memory with room for the patch CASE-WHEN.
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // Dynamic partition overwrite: ArrayStore.patchPartition must only
      // replace the partitions it writes, never truncate the table.
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // graft_gen_key / graft_ring_place available to pure-SQL users.
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
    if (shufflePartitions > 0)
      b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    else b
  }
}

package graft

import org.apache.spark.sql.functions._

/** Bucket-skew histogram for the s2/s10 sign-LSH bank: for each corpus
  * dir, prints n, the adaptive k, bucket count, E[bucket], the quadratic
  * candidate mass sum(|b|^2) (= the SMJ output rows of s10's in-bucket
  * self-join), and the largest buckets. This is the probe that decides
  * whether s10's superlinear wall-clock is cluster skew (near-dup groups
  * share a bucket at any k) or adaptive-k under-splitting.
  * `runMain graft.ProbeBuckets <dir>...`
  */
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Similarity
    for (dir <- args) {
      val n0 = Similarity.normed(spark, dir)
      val n = n0.count()
      val q = n / Similarity.S2BucketTarget
      val k = math.max(Similarity.S2KMin, 64 - java.lang.Long.numberOfLeadingZeros(q)).toInt
      val b = n0.withColumn("bucket",
          graft.functions.SignLshBucket(col("emb"), lit(k)))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      val stats = b.agg(count(lit(1)).as("nb"), sum(col("c") * col("c")).as("sumsq"),
        max("c").as("mx"), expr("percentile_approx(c, 0.5)").as("med")).first()
      val top = b.orderBy(col("c").desc).limit(12).collect()
        .map(r => r.getLong(1)).mkString(",")
      println(s"[buckets] $dir n=$n k=$k buckets=${stats.getLong(0)} " +
        s"E=${n / math.max(1L, 1L << k)} sumsq=${stats.getLong(1)} " +
        s"max=${stats.getLong(2)} med=${stats.get(3)} top12=[$top]")
    }
    spark.stop()
  }
}

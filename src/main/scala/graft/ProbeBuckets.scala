package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-skew histogram for BOTH sign-LSH banks — s2/s10's single bank
  * and d5's T-table bank. For each corpus dir it records n, the adaptive
  * k (via the operators' own rules, Similarity.s2K / Dedup.embK — a rule
  * change can no longer leave this probe measuring a stale k), bucket
  * count, E[bucket], max|bucket|, the quadratic candidate mass Σ|b|²
  * (= the UNBANDED self-join's output rows), the number of buckets past
  * the band threshold W+1, and the banded join's output rows computed
  * from the histogram (s10 scores each unordered pair twice, d5 once).
  * This is the standing per-round LSH evidence (round-12 protocol): the
  * executed-plan row counts caught the falsified e=1.07 claim at tier160
  * when wall-clock and shuffle bytes both missed it.
  *
  * `runMain graft.ProbeBuckets <dir>...` — env GRAFT_PROBE_JSON=<path>
  * additionally writes one JSON artifact covering all probed dirs.
  */
object ProbeBuckets {
  /** Unordered in-bucket pairs under a width-w band: positions i<j with
    * j-i ≤ w. Exact: b(b-1)/2 for b ≤ w+1; else the last w rows pair
    * fully among themselves and each of the first b-w rows pairs with
    * its next w — (b-w)·w + w(w-1)/2.
    */
  def bandedPairs(b: Long, w: Long): Long =
    if (b <= w + 1) b * (b - 1) / 2 else (b - w) * w + w * (w - 1) / 2

  case class BankStats(n: Long, k: Int, tables: Int, buckets: Long,
                       mean: Double, max: Long, sumsq: Long, overW: Long,
                       bandedPairsN: Long, exactPairsN: Long, top12: Seq[Long])

  def stats(hist: DataFrame, n: Long, k: Int, tables: Int, w: Long): BankStats = {
    val agg = hist.agg(count(lit(1)).as("nb"),
      sum(col("c") * col("c")).as("sumsq"), max("c").as("mx"),
      sum(when(col("c") > w + 1, 1L).otherwise(0L)).as("over")).first()
    val top = hist.orderBy(col("c").desc).limit(12).collect().map(_.getLong(0)).toSeq
    val pairs = hist.select(col("c")).collect().map(_.getLong(0))
      .foldLeft((0L, 0L)) { case ((bp, ep), b) =>
        (bp + bandedPairs(b, w), ep + b * (b - 1) / 2) }
    BankStats(n, k, tables, agg.getLong(0), n.toDouble * tables / math.max(1L, agg.getLong(0)),
      agg.getLong(2), agg.getLong(1), agg.getLong(3), pairs._1, pairs._2, top)
  }

  def s2Bank(spark: SparkSession, dir: String): BankStats = {
    val n0 = graft.pipeline.Similarity.normed(spark, dir)
    val n = n0.count()
    val k = graft.pipeline.Similarity.s2K(n)
    val hist = n0.withColumn("bucket",
        graft.functions.SignLshBucket(col("emb"), lit(k)))
      .groupBy("bucket").agg(count(lit(1)).as("c")).select("c")
    stats(hist, n, k, 1, graft.pipeline.Similarity.S10BandW.toLong)
  }

  def d5Bank(spark: SparkSession, dir: String): BankStats = {
    import spark.implicits._
    import graft.pipeline.Dedup
    val n0 = graft.pipeline.Similarity.normed(spark, dir).select("vec_id", "emb")
    val n = n0.count()
    val k = Dedup.embK(n)
    val tCount = Dedup.embTablesFor(k)
    val hist = n0.as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (_, emb) =>
        val bs = Dedup.kernelBuckets(emb, k, tCount)
        (0 until tCount).iterator.map(t => (t, bs(t)))
      })
      .toDF("tbl", "bkt")
      .groupBy("tbl", "bkt").agg(count(lit(1)).as("c")).select("c")
    stats(hist, n, k, tCount, Dedup.EmbBandW.toLong)
  }

  def jsonOf(b: BankStats, w: Long): String =
    s"""{"n":${b.n},"k":${b.k},"tables":${b.tables},"band_w":$w,""" +
      s""""buckets":${b.buckets},"mean_bucket":${"%.1f".formatLocal(java.util.Locale.ROOT, b.mean)},""" +
      s""""max_bucket":${b.max},"sumsq":${b.sumsq},"buckets_over_w1":${b.overW},""" +
      s""""banded_join_pairs":${b.bandedPairsN},"exact_join_pairs":${b.exactPairsN},""" +
      s""""top12":[${b.top12.mkString(",")}]}"""

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entries = args.toSeq.map { dir =>
      val s2 = s2Bank(spark, dir)
      val d5 = d5Bank(spark, dir)
      println(s"[buckets] $dir s2: n=${s2.n} k=${s2.k} buckets=${s2.buckets} " +
        s"E=${s2.mean.round} sumsq=${s2.sumsq} max=${s2.max} overW=${s2.overW} " +
        s"bandedPairs=${s2.bandedPairsN} exactPairs=${s2.exactPairsN} top12=[${s2.top12.mkString(",")}]")
      println(s"[buckets] $dir d5: n=${d5.n} k=${d5.k} T=${d5.tables} buckets=${d5.buckets} " +
        s"E=${d5.mean.round} sumsq=${d5.sumsq} max=${d5.max} overW=${d5.overW} " +
        s"bandedPairs=${d5.bandedPairsN} exactPairs=${d5.exactPairsN} top12=[${d5.top12.mkString(",")}]")
      s""""$dir":{"s2":${jsonOf(s2, graft.pipeline.Similarity.S10BandW.toLong)},""" +
        s""""d5":${jsonOf(d5, graft.pipeline.Dedup.EmbBandW.toLong)}}"""
    }
    sys.env.get("GRAFT_PROBE_JSON").foreach { path =>
      val body = entries.mkString("{", ",\n", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (body + "\n").getBytes("UTF-8"))
      println(s"[buckets] wrote $path")
    }
    spark.stop()
  }
}

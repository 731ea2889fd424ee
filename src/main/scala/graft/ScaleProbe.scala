package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Larger-SF scaling probe (SURVEY §8): sf0.1's 0.1-1.5s per-query times
  * are overhead-dominated, so the committed growth exponents (sf0.01 →
  * sf0.1) bound the true scaling from below. This main derives a
  * deterministic `mult`× corpus from the main SF under tmpdir, times the
  * pipeline (d/s) families there, and writes SCALE_UP.json — one more
  * decade of measured range on exactly the ops whose 100 TB story the
  * design leans on (capped LSH candidates, bucketed verify, label
  * propagation). `runMain graft.ScaleProbe [mult] [mainSfDir]`.
  *
  * Replication preserves per-replica structure and kills cross-replica
  * affinity, so the dedup/similarity workload grows LINEARLY with the
  * corpus instead of quadratically by construction:
  *  - documents: replica i>0 suffixes every token with "x{i}" — shingle
  *    sets within a replica mirror the original corpus exactly, across
  *    replicas they are disjoint (no cross-replica candidates). doc_id
  *    offsets by i·10⁷ keep d9's benchmark prefix (doc_id < 20) replica-0
  *    only, so the decontamination reference set stays fixed while the
  *    corpus grows — the realistic shape.
  *  - embeddings: replica i multiplies dimension d by the ±1 sign drawn
  *    from bit d of splitmix64-mixed i — within-replica cosines are
  *    bit-identical to the original corpus, cross-replica cosines are
  *    sign-scrambled to random-like. (float · ±1f is exact.)
  *
  * Both LSH families adapt k in-plan (round 8; UNCAPPED since round 11:
  * d5 k = max(bitLength(n/256), 3) with table count embTablesFor(k) on
  * the LSH ρ-exponent schedule; s2 the same rule, kmin 4, via the native
  * SignLshBucket expression) — a larger probe corpus activates a larger
  * k (and for d5 a larger T) and measures the adaptation for real. The
  * probe measures the SHIPPED configuration honestly, not a re-tuned one.
  */
object ScaleProbe {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Derive the mult× corpus (documents + embeddings) under tmpdir. */
  def generate(s: SparkSession, mainDir: String, mult: Int): String =
    generate(s, mainDir, mult, None)

  /** As above; `target` writes to a caller-owned dir that survives JVM
    * exit (no TmpCleanup) — MakeTier uses this so a Verify run in a
    * LATER process can gate the tier corpus against the DuckDB oracle.
    */
  def generate(s: SparkSession, mainDir: String, mult: Int,
               target: Option[String]): String = {
    val dir = target.getOrElse {
      val d = s"${System.getProperty("java.io.tmpdir")}/graft-scaleup-" +
        s"${ProcessHandle.current.pid}-$mult"
      TmpCleanup.register(d)
      d
    }
    val docs = Tables.documents(s, mainDir)
    val docReps = (0 until mult).map { i =>
      if (i == 0) docs
      else {
        val t = concat_ws(" ",
          transform(split(col("text"), " "), tok => concat(tok, lit(s"x$i"))))
        docs.select(
          (col("doc_id") + i * 10000000L).as("doc_id"),
          t.as("text"), col("lang"), col("source"),
          length(t).as("n_chars"))
      }
    }
    docReps.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = Tables.embeddings(s, mainDir)
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val embReps = (0 until mult).map { i =>
      if (i == 0) emb
      else {
        val bits = splitmix64(i.toLong)
        val signs = array((0 until dims).map(d =>
          lit(if (((bits >> (d % 64)) & 1L) == 1L) -1.0f else 1.0f)): _*)
        emb.select(
          (col("vec_id") + i * 10000000L).as("vec_id"),
          zip_with(col("embedding"), signs, (x, sg) => x * sg).as("embedding"),
          col("label"))
      }
    }
    embReps.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(5)
    val mainDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // session warm-up, as in Bench
    val upDir = generate(spark, mainDir, mult)
    def rows(dir: String, t: String): Double =
      spark.read.parquet(s"$dir/$t.parquet").count().toDouble
    val docRatio = rows(upDir, "documents") / rows(mainDir, "documents")
    val embRatio = rows(upDir, "embeddings") / rows(mainDir, "embeddings")
    val ops = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => k.matches("^[ds]\\d+_.*") }
    val entries = ops.map { case (name, fn) =>
      // warm once per dir (codegen/JIT), then min of 4: at 0.2-1s absolute
      // timings host noise and neighbor-op ContextCleaner work swing
      // min-of-2 by 3-4x between invocations (observed on s3/s4) — the
      // extra runs plus a GC barrier per op keep the exponent honest
      def time(dir: String): Double = {
        System.gc()
        fn(spark, dir).count()
        (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val tMain = time(mainDir)
      val tUp = time(upDir)
      val ratio = if (name == "d5_embed_dedup" || name.startsWith("s")) embRatio else docRatio
      val e = math.log(tUp / tMain) / math.log(ratio)
      println(f"[scaleprobe] $name t_main=$tMain%.3f t_up=$tUp%.3f e=$e%.2f")
      val f3 = (v: Double) => Bench.fnum(v, 3)
      s""""$name":{"t_main":${f3(tMain)},"t_up":${f3(tUp)},"exponent":${Bench.fnum(e, 2)}}"""
    }
    val json =
      s"""{"mult":$mult,"main_sf":"$mainDir","doc_ratio":${Bench.fnum(docRatio, 1)},""" +
        s""""emb_ratio":${Bench.fnum(embRatio, 1)},"timing":"min of 4 after warm + GC barrier",""" +
        s""""note":"d5 and s2 adapt k in-plan UNCAPPED since r11 (k=max(bitLength(n/256),kmin); d5 table count embTablesFor(k) on the rho-exponent schedule); bucket population pinned at any n (SURVEY par.5)",""" +
        s""""ops":${entries.mkString("{", ",", "}")}}"""
    // mult 5 is the long-standing SCALE_UP.json artifact; other tiers get
    // their own file so a larger probe extends the record without
    // overwriting the committed decade
    val outFile = if (mult == 5) "SCALE_UP.json" else s"SCALE_UP_${mult}x.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}

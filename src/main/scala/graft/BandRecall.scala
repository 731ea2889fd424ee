package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the s10/d5 band rule sacrifices — the round-12 item
  * that turns the "any W neighbors are near-ties of the true top-k"
  * claim into evidence. The s10/d5 oracles replay the band heuristic
  * verbatim (the one place the gate mirrors the operator instead of
  * checking it), so this tool compares the BANDED operators against
  * their EXACT full-in-bucket twins (band width = 2³⁰, i.e. never
  * truncating) on real skewed tiers:
  *
  *  - s10: edge recall@GraphK (fraction of exact top-k edges the banded
  *    graph keeps) and the cosine regret per (vec_id, rnk) slot — banded
  *    candidates are a subset, so regret ≥ 0 and "near-tie" has a
  *    number;
  *  - d5: pair recall in the θ ≥ 0.45 band (banded ⊆ exact, proven by
  *    an anti-join inside the run) AND connected-component equality
  *    under min-label propagation — d5's consumer is d7's grouping, so
  *    identical components mean the sacrificed pairs were redundant for
  *    dedup semantics.
  *
  * `runMain graft.BandRecall <outJson> <dir>...` — widths from
  * GRAFT_BAND_WS (default "256,512": the r11 width and the shipped
  * round-12 width).
  */
object BandRecall {
  val ExactW: Int = 1 << 30

  def fmt(v: Double): String = "%.6f".formatLocal(java.util.Locale.ROOT, v)

  /** Min-reachable-id labels per vector — the canonical connected-
    * component assignment (d7's semantics). Iterates to fixpoint;
    * rounds = graph diameter, which for a banded cluster of size c is
    * ceil((c-1)/W) (position-adjacent pairs are always kept).
    */
  def components(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .repartition(col("u")).cache()
    var lab = edges.select(col("u").as("id")).distinct()
      .withColumn("lab", col("id")).cache()
    var changed = 1L
    while (changed > 0) {
      val next = edges.join(lab, edges("v") === lab("id"))
        .groupBy("u").agg(min("lab").as("nlab"))
        .join(lab, col("u") === lab("id"))
        .select(col("u").as("id"), least(col("lab"), col("nlab")).as("lab"))
        .localCheckpoint()
      changed = next.join(lab.withColumnRenamed("lab", "old"), "id")
        .filter(col("lab") =!= col("old")).count()
      lab.unpersist()
      lab = next.cache()
    }
    edges.unpersist()
    lab
  }

  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val dirs = args.drop(1).toSeq
    val widths = sys.env.getOrElse("GRAFT_BAND_WS", "256,512")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Dedup, Similarity}

    val entries = dirs.map { dir =>
      // --- exact arms, computed once per dir ---------------------------
      val s10Exact = Similarity.s10KnnGraphBanded(spark, dir, ExactW)
        .select("vec_id", "rnk", "neighbor_id", "cosine").cache()
      val s10ExactEdges = s10Exact.count()
      val d5Exact = Dedup.d5EmbedDedupBanded(spark, dir, ExactW)
        .select("id_a", "id_b").cache()
      val d5ExactPairs = d5Exact.count()
      val d5ExactComp = components(spark, d5Exact).cache()
      val d5Groups = d5ExactComp.agg(countDistinct("lab")).first().getLong(0)
      println(s"[bandrecall] $dir exact: s10_edges=$s10ExactEdges " +
        s"d5_pairs=$d5ExactPairs d5_groups=$d5Groups")

      val wEntries = widths.map { w =>
        val s10B = Similarity.s10KnnGraphBanded(spark, dir, w)
          .select("vec_id", "rnk", "neighbor_id", "cosine").cache()
        val s10Edges = s10B.count()
        val hits = s10B.select("vec_id", "neighbor_id")
          .join(s10Exact.select("vec_id", "neighbor_id"), Seq("vec_id", "neighbor_id"))
          .count()
        val recall = hits.toDouble / math.max(1L, s10ExactEdges)
        // regret per rank slot: exact_cos - banded_cos >= 0 (banded
        // candidates are a subset, so the banded k-th cosine can only
        // be lower at the same slot)
        val reg = s10B.select(col("vec_id"), col("rnk"), col("cosine").as("bc"))
          .join(s10Exact.select(col("vec_id"), col("rnk"), col("cosine").as("ec")),
            Seq("vec_id", "rnk"))
          .agg(avg(col("ec") - col("bc")).as("avg"), max(col("ec") - col("bc")).as("mx"))
          .first()
        s10B.unpersist()

        val d5B = Dedup.d5EmbedDedupBanded(spark, dir, w)
          .select("id_a", "id_b").cache()
        val d5Pairs = d5B.count()
        val spurious = d5B.join(d5Exact, Seq("id_a", "id_b"), "left_anti").count()
        val d5Recall = (d5Pairs - spurious).toDouble / math.max(1L, d5ExactPairs)
        val d5BComp = components(spark, d5B)
        val compMismatch = d5BComp.withColumnRenamed("lab", "blab")
          .join(d5ExactComp, Seq("id"), "full_outer")
          .filter(not(col("blab") <=> col("lab"))).count()
        d5B.unpersist()
        println(s"[bandrecall] $dir w=$w s10: edges=$s10Edges recall=${fmt(recall)} " +
          s"regret_avg=${fmt(reg.getDouble(0))} regret_max=${fmt(reg.getDouble(1))} " +
          s"| d5: pairs=$d5Pairs recall=${fmt(d5Recall)} spurious=$spurious " +
          s"comp_mismatch=$compMismatch")
        s""""$w":{"s10":{"edges":$s10Edges,"recall":${fmt(recall)},""" +
          s""""regret_avg":${fmt(reg.getDouble(0))},"regret_max":${fmt(reg.getDouble(1))}},""" +
          s""""d5":{"pairs":$d5Pairs,"recall":${fmt(d5Recall)},"spurious":$spurious,""" +
          s""""component_mismatches":$compMismatch}}"""
      }
      s10Exact.unpersist(); d5Exact.unpersist(); d5ExactComp.unpersist()
      s""""$dir":{"exact":{"s10_edges":$s10ExactEdges,"d5_pairs":$d5ExactPairs,""" +
        s""""d5_groups":$d5Groups},${wEntries.mkString(",")}}"""
    }
    val body = "{" + entries.mkString(",\n") +
      s""",${Bench.gitStamp},"method":"banded operator vs band_w=2^30 exact twin; recall over exact edge/pair set; regret = exact minus banded cosine at the same (vec_id,rnk); components = min-label propagation fixpoint"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (body + "\n").getBytes("UTF-8"))
    println(s"[bandrecall] wrote $outJson")
    spark.stop()
  }
}

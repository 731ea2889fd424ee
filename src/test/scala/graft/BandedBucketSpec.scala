package graft

import graft.pipeline.Similarity

/** The truncating regime of s10's round-11 candidate bound: a synthetic
  * cluster corpus whose vectors all share ONE sign-LSH bucket (near-copies
  * of a single direction — the skew shape no plane count can split), with
  * the bucket larger than S10BandW+1 so the |Δpos| ≤ W band rule actually
  * truncates. Proves, against a from-definition JVM recount:
  *  - the band-join execution device (explode to adjacent bands, join on
  *    (bucket, band), corner filter) emits exactly the {Δpos ≤ W}
  *    candidate set, each pair once — no duplicate edges, no corner loss;
  *  - every vector still gets its full GraphK neighbors (the bound keeps
  *    ≥ 2·min(W, |bucket|-1) ≥ GraphK candidates per vector);
  *  - per-vector candidate work is capped at 2W regardless of cluster
  *    size — the structural skew elimination the 100 TB story rests on.
  */
class BandedBucketSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("s10 band rule truncates oversized cluster buckets exactly per definition") {
    val dims = Similarity.Dims
    val n = 600 // one cluster > S10BandW + 1 = 257 rows
    assert(n > Similarity.S10BandW + 1)
    def u01(x0: Long): Double = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val base = Array.tabulate(dims)(d => u01(d.toLong * 7919))
    // near-copies: tiny relative noise keeps every plane dot's sign
    val vecs = Array.tabulate(n, dims)((i, d) =>
      (base(d) * (1.0 + 1e-4 * u01(i.toLong * 104729 + d))).toFloat)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-s10band-${ProcessHandle.current.pid}"
    TmpCleanup.register(dir)
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, id) => (id.toLong, v.toSeq, id % 7) }
      .toSeq.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // JVM ground truth straight from the definition (operator fold
    // semantics: double-cast floats, left-to-right accumulation)
    val all = vecs.map(_.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var d = 0
      while (d < a.length) { acc += a(d) * b(d); d += 1 }
      acc
    }
    val norms = all.map(v => math.sqrt(dot(v, v)))
    val q = n.toLong / Similarity.S2BucketTarget
    val k = math.max(Similarity.S2KMin, 64 - java.lang.Long.numberOfLeadingZeros(q))
    def bucketOf(v: Array[Double]): Long =
      (0 until k.toInt).map { i =>
        if (dot(v, Similarity.planes(i).toArray) > 0) 1L << i else 0L
      }.sum
    val buckets = all.map(bucketOf)
    assert(buckets.distinct.length == 1,
      s"construction: cluster split across buckets ${buckets.distinct.toSeq}")

    val w = Similarity.S10BandW
    // pos = rank by vec_id within the (single) bucket = id + 1
    val expected = (0 until n).flatMap { i =>
      val cands = (0 until n).filter(j => j != i && math.abs(i - j) <= w)
      assert(cands.length <= 2 * w, "candidate cap violated in recount")
      cands.map { j => (j.toLong, dot(all(i), all(j)) / (norms(i) * norms(j))) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(Similarity.GraphK)
        .zipWithIndex
        .map { case ((nid, c), r) => (i.toLong, (r + 1).toLong, nid, c) }
    }.sortBy { case (id, r, _, _) => (id, r) }
    assert(expected.size == n * Similarity.GraphK,
      "every vector must keep its full GraphK neighbors under the bound")

    val got = Similarity.s10KnnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected,
      s"banded graph mismatch: got ${got.size} rows, expected ${expected.size}")
    // the truncation must be real: a same-bucket pair past the band is
    // NOT scored even though the old full in-bucket rule would score it
    assert(n - 1 > w, "corpus must contain past-the-band pairs")
  }

  test("d5 band keeps oversized clusters connected with |b|*W pairs, not C(|b|,2)") {
    import graft.pipeline.Dedup
    val dims = Similarity.Dims
    val n = 600
    val w = Dedup.EmbBandW
    assert(n > w + 1)
    def u01(x0: Long): Double = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val base = Array.tabulate(dims)(d => u01(d.toLong * 6121))
    val vecs = Array.tabulate(n, dims)((i, d) =>
      (base(d) * (1.0 + 1e-4 * u01(i.toLong * 65537 + d))).toFloat)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-d5band-${ProcessHandle.current.pid}"
    TmpCleanup.register(dir)
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, id) => (id.toLong, v.toSeq, id % 7) }
      .toSeq.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // construction check: one cluster, same bucket in EVERY table (this
    // is the skew shape banding exists for — no k splits near-copies)
    val k = Dedup.embK(n)
    val tCount = Dedup.embTablesFor(k)
    val all = vecs.map(_.map(_.toDouble))
    val bucketRows = all.map(v => Dedup.kernelBuckets(v, k, tCount).toSeq)
    assert(bucketRows.distinct.length == 1,
      "construction: cluster split across buckets in some table")
    // all cosines ~1 >= 0.45, so the expected pair set is exactly the
    // band rule from the definition: 0 < j - i <= W over vec_id order
    val expected = (for {
      i <- 0 until n
      j <- (i + 1) until math.min(i + 1 + w, n)
    } yield (i.toLong, j.toLong)).toSet
    val got = Dedup.d5EmbedDedup(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"banded pair set mismatch: got ${got.size}, expected ${expected.size} " +
        s"(missing ${(expected -- got).take(3)}, spurious ${(got -- expected).take(3)})")
    // linear, not quadratic: far fewer than all C(n,2) cluster pairs...
    assert(got.size < n.toLong * (n - 1) / 2)
    // ...but every adjacent pair is present, so the cluster remains one
    // connected component for downstream grouping
    assert((0 until n - 1).forall(i => got.contains((i.toLong, i + 1L))))
  }

  test("s2K scalar and s2KCol column agree across every k-band edge") {
    // One rule, two forms (the probe and ground truths use the scalar,
    // the plans the column) — round-12 ADVICE closure: a rule change
    // desynchronizing them must fail here, not silently mis-measure.
    import spark.implicits._
    val target = Similarity.S2BucketTarget
    val ns: Seq[Long] = (Seq(1L, 2L, 100L) ++
      (1 to 14).flatMap { k =>
        val edge = target.toLong << k
        Seq(edge - 1, edge, edge + 1)
      }).distinct
    val fromCol = ns.toDF("n_vec")
      .withColumn("k", Similarity.s2KCol)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach { n =>
      assert(fromCol(n) == Similarity.s2K(n),
        s"s2K($n)=${Similarity.s2K(n)} but s2KCol gives ${fromCol(n)}")
    }
  }

  test("band recall floor: skewed corpus keeps measured recall and near-tie regret") {
    // The quality claim behind the band rule ("any W neighbors are
    // near-ties of the true top-k"), pinned with numbers on a corpus
    // built to truncate: a 700-vector near-dup cluster (> W+1 = 513, so
    // banding engages) embedded in a uniform background. Measured via
    // the parameterized internals — banded operator vs its exact
    // (band_w = 2^30) twin, the same method as the committed
    // BAND_RECALL.json tier artifact this test is the CI anchor for.
    val dims = Similarity.Dims
    val nCluster = 700
    val nBg = 1300
    val n = nCluster + nBg
    assert(nCluster > Similarity.S10BandW + 1, "cluster must exceed W+1")
    def u01(x0: Long): Double = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val base = Array.tabulate(dims)(d => u01(d.toLong * 3571))
    val vecs: Array[Array[Float]] = Array.tabulate(n) { i =>
      if (i < nCluster)
        Array.tabulate(dims)(d => (base(d) * (1.0 + 1e-4 * u01(i.toLong * 104729 + d))).toFloat)
      else
        Array.tabulate(dims)(d => u01(i.toLong * 15485863 + d).toFloat)
    }
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-bandfloor-${ProcessHandle.current.pid}"
    TmpCleanup.register(dir)
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, id) => (id.toLong, v.toSeq, id % 7) }
      .toSeq.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // --- s10: edge recall@GraphK + cosine regret vs the exact twin ----
    // rows: (vec_id, rnk, neighbor_id, cosine)
    def rows(w: Int): Seq[(Long, Long, Long, Double)] =
      Similarity.s10KnnGraphBanded(spark, dir, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val exact = rows(BandRecall.ExactW)
    val banded = rows(Similarity.S10BandW)
    val exactPairs = exact.map { case (id, _, nid, _) => (id, nid) }.toSet
    val bandedPairs = banded.map { case (id, _, nid, _) => (id, nid) }.toSet
    val recall = (bandedPairs & exactPairs).size.toDouble / exactPairs.size
    // regret at each (vec_id, rnk) slot: banded candidates are a subset,
    // so exact_cos - banded_cos >= 0; "near-tie" means it stays tiny on
    // the truncating (cluster) slots
    val exactBySlot = exact.map { case (id, r, _, c) => (id, r) -> c }.toMap
    val regrets = banded.flatMap { case (id, r, _, bc) =>
      exactBySlot.get((id, r)).map(_ - bc)
    }
    assert(regrets.nonEmpty && regrets.forall(_ >= -1e-15),
      "banded cosine above exact at the same slot: subset property broken")
    val regretMax = regrets.max
    info(f"s10 recall@${Similarity.GraphK}=$recall%.4f regret_max=$regretMax%.2e " +
      s"(${exactPairs.size} exact edges)")
    assert(recall >= 0.95, s"s10 banded recall@${Similarity.GraphK} = $recall below floor 0.95")
    assert(regretMax <= 1e-3,
      s"s10 banded max cosine regret $regretMax above near-tie ceiling 1e-3")

    // --- d5: banded pairs are a subset with identical components ------
    import graft.pipeline.Dedup
    def pairSet(w: Int): Set[(Long, Long)] =
      Dedup.d5EmbedDedupBanded(spark, dir, w).select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d5Exact = pairSet(BandRecall.ExactW)
    val d5Banded = pairSet(Dedup.EmbBandW)
    assert((d5Banded -- d5Exact).isEmpty, "banded pair set must be a subset of exact")
    def comps(pairs: Set[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = pairs.flatMap(p => Seq(p._1, p._2))
      ids.map(i => i -> find(i)).toMap
    }
    assert(comps(d5Banded) == comps(d5Exact),
      "banded pair set must yield identical connected components (d7's consumer view)")
    val d5Recall = d5Banded.size.toDouble / d5Exact.size
    info(f"d5 pair recall=$d5Recall%.4f (${d5Exact.size} exact pairs), components identical")
    assert(d5Recall >= 0.5,
      s"d5 banded pair recall $d5Recall collapsed below the linear-output design floor")
  }
}

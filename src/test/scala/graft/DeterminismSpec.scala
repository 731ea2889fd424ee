package graft

/** Bit-exact partition-count independence — the §6 determinism claim,
  * enforced. A result that drifts when the shuffle fan-out changes
  * (float sum order, unstable top-k ties, per-partition state) would
  * pass a single-config oracle gate and still be wrong on a cluster
  * whose partitioning differs from the test rig's. Exercises one op per
  * determinism mechanism: exact-decimal sums (q1/a15), window ties
  * (q3), the d5 bucket kernel, minhash signatures (d2), and the
  * stateful sessionizer (q16).
  */
class DeterminismSpec extends SparkSpec {

  private val ops = Seq("q1_agg", "q3_topk", "q16_sessionize",
    "a15_subset_stats", "d2_minhash_lsh", "d5_embed_dedup",
    // round-4 additions: collect_set pair explosion (d4), iterative CC
    // composed into a rollup (d10), typed-kernel flatMap (m4), and the
    // two-phase bigram agg (t7)
    "d4_ngram_jaccard", "d10_dedup_purge", "m4_feature_extract",
    "t7_repetition",
    // round-7 second wave: bloom bitset merge order (d12 — OR is
    // commutative, proven not assumed), max_by argmax ties (d13),
    // window prefix sum (t10), df count-distinct (d11), and the full
    // funnel composition (d15)
    "d11_span_dedup", "d12_bloom_decontaminate", "d13_cluster_mixture",
    "t10_pack_sequences", "d15_curation_funnel",
    // round-8: multi-probe LSH (probe explode + window top-k ties),
    // PQ encode argmin ties + ADC candidate ranking (s8), shared-kernel
    // containment epilogue (d16)
    "s7_multiprobe", "s8_pq_ann", "d16_containment_dedup",
    "s9_recall_matrix",
    // whole-corpus self-join top-k: bucket-join fan-out + window ties
    // across every vector, the widest tie surface in the s-family
    "s10_knn_graph",
    // global TakeOrdered tracked-term selection + bounded sketch agg
    "t12_heavy_hitters")

  test("results are bit-identical across shuffle partition counts") {
    val key = "spark.sql.shuffle.partitions"
    val ref = spark.conf.get(key)
    def runWith(n: String, name: String): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set(key, n)
      try SparkEntry.queries(name)(spark, sf).collect().toSeq
      finally spark.conf.set(key, ref)
    }
    ops.foreach { name =>
      val a = runWith("3", name)
      val b = runWith("13", name)
      assert(a == b, s"$name drifts with partition count (3 vs 13)")
    }
  }
}

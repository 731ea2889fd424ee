package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2-C similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  * s1 is the exact baseline: broadcast the (small) query set against all
  * vectors — at 100 TB the vector side stays partitioned and untouched,
  * the query side is broadcast, and per-partition top-k folds into a final
  * top-k (TakeOrdered semantics via window + filter here).
  * s2 is the scale path: random-hyperplane LSH buckets as candidate
  * generator, exact cosine only inside the bucket.
  *
  * All vector math is sequential-fold double arithmetic (codegen'd
  * higher-order functions, no UDFs) so the DuckDB oracle is bit-exact.
  */
object Similarity {

  /** Embeddings with double-cast vectors + precomputed L2 norm
    * (dot(emb, emb) accumulates x_i*x_i left-to-right — the same fold as
    * the oracle's list_reduce over x²).
    */
  def normed(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("emb", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", sqrt(graft.functions.DotProduct(col("emb"), col("emb"))))
      .select("vec_id", "label", "emb", "norm")

  val normedSql: String =
    """normed AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
      |    sqrt(list_reduce(
      |      list_prepend(0.0, list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
      |      (acc, x) -> acc + x)) AS norm
      |  FROM embeddings
      |)""".stripMargin

  val Dims = 64

  /** Served top-k of every approximate arm (s2/s3/s4/s6/s7/s8): each arm
    * reports its `ArmTopK` best neighbors. `RecallK` (the recall
    * evaluation depth of s5/s9) is DEFINED as this value, so the exact
    * side of a recall join can never ask for more slots than the arms
    * serve — raising the evaluation depth means raising the serving
    * depth, one constant.
    */
  val ArmTopK = 3

  /** Per-arm query-sample ranges [lo, hi) over vec_id — the single
    * source of truth each arm's own filter AND the s9 recall matrix's
    * ground truth consume, so an arm's sample cannot drift from the
    * range its recall is measured on. S2Queries is also s1's (the exact
    * baseline scores the same sample the LSH arms serve) and s7's (the
    * multi-probe arm probes s2's exact bank and sample).
    */
  val S2Queries: (Long, Long) = (0L, 5L)
  val S3Queries: (Long, Long) = (100L, 105L)
  val S4Queries: (Long, Long) = (200L, 205L)
  val S6Queries: (Long, Long) = (300L, 305L)
  val S8Queries: (Long, Long) = (400L, 405L)

  private def inRange(c: Column, r: (Long, Long)): Column =
    c >= r._1 && c < r._2

  private def inRangeSql(c: String, r: (Long, Long)): String =
    s"($c >= ${r._1} AND $c < ${r._2})"

  /** Exact cosine: dot product / precomputed norms.
    *
    * The dot is the native DotProduct expression — a fused loop behind
    * ONE codegen call site, where a higher-order aggregate() evaluates
    * interpreted per element and an unrolled 64-term column tree bloats
    * the consumer's generated method toward the JIT limit. The loop
    * accumulates left-to-right from 0.0, so the IEEE result is identical
    * to the oracle's sequential list_reduce.
    */
  def cosine(ea: Column, eb: Column, na: Column, nb: Column): Column =
    graft.functions.DotProduct(ea, eb) / (na * nb)

  def cosineSql(a: String, b: String, na: String, nb: String): String =
    s"""list_reduce(list_prepend(0.0,
       |    list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])),
       |    (acc, x) -> acc + x) / ($na * $nb)""".stripMargin

  /** Exact brute-force top-k cosine: broadcast the query sample
    * (selected by `queryPred` over the vector table) against the full
    * corpus, per-partition scoring with the fused native dot, window
    * top-k. Shared by s1 (the exact-baseline operator, k=10) and s9
    * (ground truth for every arm, k=RecallK) so the exact-baseline
    * semantics — tie order, self-exclusion, the cosine kernel wiring —
    * live in exactly ONE subtree; `bruteTopKSql` is its oracle mirror.
    */
  private def bruteTopK(s: SparkSession, dir: String,
                        queryPred: Column, k: Int): DataFrame = {
    val e = normed(s, dir)
    val q = e.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("norm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosine(col("qe"), col("emb"), col("qn"), col("norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** Oracle mirror of [[bruteTopK]]; `predSql` filters the query alias
    * `q`. Assumes `normed` is already in scope as a CTE.
    */
  private def bruteTopKSql(predSql: String, k: Int): String =
    s"""SELECT q_id, rnk, neighbor_id, cosine FROM (
       |  SELECT q_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
       |      ${cosineSql("q.emb", "e.emb", "q.norm", "e.norm")} AS cosine
       |    FROM normed q JOIN normed e ON e.vec_id <> q.vec_id
       |    WHERE $predSql))
       |WHERE rnk <= $k""".stripMargin

  // --- s1_knn_brute: exact top-10 cosine neighbors for queries id<5 -------
  def s1KnnBrute(s: SparkSession, dir: String): DataFrame =
    bruteTopK(s, dir, inRange(col("vec_id"), S2Queries), 10)
      .orderBy("q_id", "rnk")

  val s1Sql: String =
    s"""WITH $normedSql
       |${bruteTopKSql(inRangeSql("q.vec_id", S2Queries), 10)}
       |ORDER BY q_id, rnk""".stripMargin

  // --- s2_lsh_ann: random-hyperplane buckets + in-bucket exact top-3 ------
  // k (planes, so 2^k buckets) is ADAPTIVE exactly like d5's (round 8)
  // and, since round 11, UNCAPPED: frozen k means per-query candidate
  // work grows as n/2^k — linear in the corpus — and a CLAMPED k merely
  // defers the same growth to n > 2^kmax·target (round 10 measured s10's
  // in-bucket CPU at e ≈ 1.54 past the old kmax = 8 ceiling). Now
  // k = max(kmin, bitLength(n/target)) with no upper clamp: the bucket is
  // the native [[graft.functions.SignLshBucket]] kernel, which generates
  // planes on demand (splitmix64 since round 12 — the old LCG's
  // cross-plane correlation was a measured quality defect, see the
  // coeff scaladoc), so E[bucket] stays
  // pinned near the target at ANY corpus size. The only residual bound
  // is the Long bucket type's 62 bits — reached at n = 2⁶² · 256 rows,
  // past what a Long row count can address. The vector count rides the
  // plan as a broadcast 1-row aggregate; the oracle replays the bank
  // k-generically via an S2OracleK-deep unroll gated on i < k, guarded
  // loudly (error()) past its unroll — a verification-artifact depth,
  // not an operator ceiling. At the verify SFs (n = 500 / 2000 →
  // q = n/256 < 16) the rule selects k = S2KMin = 4 — bit-identical to
  // the pre-adaptive operator.
  val S2KMin = 4
  val S2BucketTarget = 256

  /** Oracle unroll depth: the DuckDB text carries S2OracleK gated plane
    * literals, covering every k the gate tiers can select — k = 14 admits
    * n < 2¹⁴·256 = 4,194,304 vectors (round 14: one doubling ahead of a
    * future tier1280's n = 2.56M, the d5 twin — see Dedup.EmbOracleK).
    * Past it the oracle raises via error() instead of silently
    * truncating the bucket. The OPERATOR has no such bound (planes are
    * generated on demand in the kernel); every k ≤ 13 text decision is
    * unchanged — the added plane is gated on `i < k` like all the
    * others.
    */
  val S2OracleK = 14

  /** Deterministic pseudo-random hyperplanes in [-1,1): splitmix64 over
    * (p,d) (see [[graft.functions.SignLshImpl.coeff]] — the kernel and
    * this oracle bank share one formula; round 12 retired the r7–r11
    * LCG whose cross-plane correlation built mega-buckets of unrelated
    * vectors — the measured band-recall defect). Values are dyadic
    * rationals -> exact decimal literals -> both engines parse the
    * identical double. Materialized to S2OracleK here only for the
    * oracle text and the specs' ground-truth recomputation.
    */
  val planes: Seq[Seq[Double]] = (0 until S2OracleK).map { p =>
    (0 until 64).map(d => graft.functions.SignLshImpl.coeff(p, d))
  }

  private def planeSqlList(p: Seq[Double]): String =
    "[" + p.map(x => new java.math.BigDecimal(x).toPlainString).mkString(", ") + "]"

  /** The s2 adaptive-k rule as a scalar — THE definition, mirrored by
    * [[s2KCol]] for in-plan use and called by diagnostics (ProbeBuckets)
    * so a rule change can never leave a probe measuring a stale k
    * (round-12 ADVICE closure; Dedup.embK is the d5 twin).
    */
  def s2K(n: Long): Int = {
    val q = n / S2BucketTarget
    math.max(S2KMin, 64 - java.lang.Long.numberOfLeadingZeros(q))
  }

  /** [[s2K]] as a column — length(bin(q)) is the exact integer log₂
    * quantization both engines agree on (the d5/t9 doctrine; no libm
    * anywhere near the plan). Scalar↔column parity is pinned directly in
    * BandedBucketSpec (value sweep across the k-band edges) and
    * indirectly by every s2/s10 ground-truth recount, which derives k
    * from the scalar rule. No upper clamp: see the s2 block comment.
    */
  private[graft] def s2KCol: Column = {
    val q = expr(s"n_vec div $S2BucketTarget")
    greatest(lit(S2KMin),
      when(q === 0, lit(0)).otherwise(length(bin(q))))
  }

  /** Sign-bucket id — one native fused kernel call (planes generated on
    * demand inside, memoized process-wide), codegen-compact where an
    * unrolled gated-DotProduct column tree at useful bank depths would
    * blow the consumer's JIT budget.
    */
  def bucketCol(k: Column): Column =
    graft.functions.SignLshBucket(col("emb"), k)

  /** k-generic oracle mirror: references alias `k` (cross-joined params
    * CTE). Gate-first CASE so DuckDB's lazy branch evaluation skips the
    * inactive planes' dots entirely.
    */
  def bucketSqlExpr(emb: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = s"""list_reduce(list_prepend(0.0,
                   |  list_transform(range(1, 65), i -> $emb[i] * (${planeSqlList(p)})[i])),
                   |  (acc, x) -> acc + x)""".stripMargin
      s"CASE WHEN $i >= k THEN 0 WHEN $dot > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")

  val s2ParamsSql: String =
    s"""params AS (
       |  SELECT CASE WHEN k > $S2OracleK THEN CAST(error(
       |      's2 oracle bank unrolled to $S2OracleK planes (n < ${S2BucketTarget.toLong << S2OracleK}); got k=' || k)
       |      AS INT) ELSE k END AS k
       |  FROM (SELECT GREATEST($S2KMin,
       |    CASE WHEN n // $S2BucketTarget = 0 THEN 0
       |         ELSE length(bin(n // $S2BucketTarget)) END) AS k
       |  FROM (SELECT COUNT(*) AS n FROM normed)))""".stripMargin

  def s2LshAnn(s: SparkSession, dir: String): DataFrame = {
    val n0 = normed(s, dir)
    val nRow = n0.groupBy().agg(count(lit(1)).as("n_vec"))
    val e = n0.crossJoin(broadcast(nRow))
      .withColumn("bucket", bucketCol(s2KCol))
      .drop("n_vec")
    val q = e.filter(inRange(col("vec_id"), S2Queries))
      .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
              col("emb").as("qe"), col("norm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    e.join(broadcast(q), col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosine(col("qe"), col("emb"), col("qn"), col("norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= ArmTopK)
      .select(col("q_id"), col("q_bucket").as("bucket"), col("rnk"),
              col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val s2Sql: String =
    s"""WITH $normedSql,
       |$s2ParamsSql,
       |bucketed AS (
       |  SELECT vec_id, emb, norm,
       |    CAST(${bucketSqlExpr("emb")} AS BIGINT) AS bucket
       |  FROM normed, params),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.bucket AS bucket, e.vec_id AS neighbor_id,
       |    ${cosineSql("q.emb", "e.emb", "q.norm", "e.norm")} AS cosine
       |  FROM bucketed q JOIN bucketed e
       |    ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
       |  WHERE ${inRangeSql("q.vec_id", S2Queries)}),
       |ranked AS (
       |  SELECT q_id, bucket, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT q_id, bucket, rnk, neighbor_id, cosine FROM ranked
       |WHERE rnk <= $ArmTopK ORDER BY q_id, rnk""".stripMargin

  // --- s3_ivf_ann: coarse-quantizer (IVF-style) ANN -----------------------
  // The inverted-file skeleton: vectors are assigned to their nearest
  // coarse centroid once (a write-time partitioning at scale — cluster id
  // becomes the partition key), queries probe only the nProbe nearest
  // centroids and re-rank exactly inside them. Deterministic "training":
  // the first NumCentroids vectors serve as centroids, so the oracle can
  // replay the exact pipeline. Complements s2's LSH as the second
  // sub-linear candidate-generation path.
  val NumCentroids = 8
  val NProbe = 2

  def s3IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir)
    val cents = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("c_id"), col("emb").as("ce"), col("norm").as("cn"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("c_cos", cosine(col("emb"), col("ce"), col("norm"), col("cn")))
      .withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") === 1)
      .select(col("vec_id"), col("emb"), col("norm"), col("c_id").as("cluster"))
    val q = e.filter(inRange(col("vec_id"), S3Queries))
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("norm").as("qn"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("p_cos").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("p_cos", cosine(col("qe"), col("ce"), col("qn"), col("cn")))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= NProbe)
      .select(col("q_id"), col("qe"), col("qn"), col("c_id").as("cluster"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes).join(assigned, "cluster")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosine(col("qe"), col("emb"), col("qn"), col("norm")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= ArmTopK)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
              col("cluster"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val s3Sql: String =
    s"""WITH $normedSql,
       |cents AS (
       |  SELECT vec_id AS c_id, emb AS ce, norm AS cn FROM normed
       |  WHERE vec_id < $NumCentroids),
       |assigned AS (
       |  SELECT vec_id, emb, norm, c_id AS cluster FROM (
       |    SELECT e.vec_id, e.emb, e.norm, c.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosineSql("e.emb", "c.ce", "e.norm", "c.cn")} DESC, c.c_id) AS arnk
       |    FROM normed e CROSS JOIN cents c) WHERE arnk = 1),
       |probes AS (
       |  SELECT q_id, qe, qn, cluster FROM (
       |    SELECT q.vec_id AS q_id, q.emb AS qe, q.norm AS qn, c.c_id AS cluster,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${cosineSql("q.emb", "c.ce", "q.norm", "c.cn")} DESC, c.c_id) AS prnk
       |    FROM normed q CROSS JOIN cents c
       |    WHERE ${inRangeSql("q.vec_id", S3Queries)}) WHERE prnk <= $NProbe),
       |cand AS (
       |  SELECT p.q_id, a.cluster, a.vec_id AS neighbor_id,
       |    ${cosineSql("p.qe", "a.emb", "p.qn", "a.norm")} AS cosine
       |  FROM probes p JOIN assigned a
       |    ON p.cluster = a.cluster AND a.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |                               ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM cand)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cluster, cosine
       |FROM ranked WHERE rnk <= $ArmTopK ORDER BY q_id, rnk""".stripMargin

  // --- s4_sq_ann: scalar-quantized candidates + exact re-rank -------------
  // The memory-side scale path: int8-style scalar quantization (per-vector
  // scale = 127/max|x|) shrinks the resident vector set 4-8x; candidate
  // generation runs on exact INTEGER dot products of the quantized codes
  // (bit-exact on any engine, no float-order concerns), and only the
  // top-C=20 candidates per query are re-ranked with the exact double
  // cosine. Complements s2 (hash buckets) and s3 (inverted lists) as the
  // third standard ANN architecture.
  val SqCandidates = 20

  /** vectors + quantized codes. qscale guarded so all-zero vectors
    * quantize to zeros rather than NaN.
    */
  def quantized(s: SparkSession, dir: String): DataFrame =
    normed(s, dir)
      .withColumn("maxabs", expr("array_max(transform(emb, x -> abs(x)))"))
      .withColumn("qscale",
        when(col("maxabs") > 0, lit(127.0) / col("maxabs")).otherwise(lit(0.0)))
      .withColumn("qvec", expr("transform(emb, x -> CAST(round(x * qscale) AS BIGINT))"))
      .select("vec_id", "emb", "norm", "qvec")

  val quantizedSql: String =
    """quant AS (
      |  SELECT vec_id, emb, norm,
      |    list_transform(emb, x -> CAST(round(x * qscale) AS BIGINT)) AS qvec
      |  FROM (
      |    SELECT vec_id, emb, norm,
      |      CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS qscale
      |    FROM (
      |      SELECT vec_id, emb, norm,
      |        list_max(list_transform(emb, x -> abs(x))) AS maxabs
      |      FROM normed))
      |)""".stripMargin

  /** Exact integer dot of two quantized codes (native fused loop). */
  private def qdot(a: Column, b: Column): Column =
    graft.functions.LongDotProduct(a, b)

  def s4SqAnn(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val q = e.filter(inRange(col("vec_id"), S4Queries))
      .select(col("vec_id").as("q_id"), col("emb").as("qe"),
              col("norm").as("qn"), col("qvec").as("qq"))
    val wCand = Window.partitionBy("q_id").orderBy(col("qdot").desc, col("vec_id"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("qdot", qdot(col("qvec"), col("qq")))
      .withColumn("crnk", row_number().over(wCand))
      .filter(col("crnk") <= SqCandidates)
      .withColumn("cosine", cosine(col("qe"), col("emb"), col("qn"), col("norm")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= ArmTopK)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
              col("qdot"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val s4Sql: String = {
    val qdotSql =
      """list_reduce(list_prepend(CAST(0 AS BIGINT),
        |  list_transform(range(1, 65), i -> e.qvec[i] * q.qvec[i])),
        |  (a, b) -> a + b)""".stripMargin
    s"""WITH $normedSql, $quantizedSql,
       |cand AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id, e.emb, e.norm,
       |      q.emb AS qe, q.norm AS qn,
       |      $qdotSql AS qdot,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |                         ORDER BY $qdotSql DESC, e.vec_id) AS crnk
       |    FROM quant e JOIN quant q
       |      ON ${inRangeSql("q.vec_id", S4Queries)} AND e.vec_id <> q.vec_id)
       |  WHERE crnk <= $SqCandidates),
       |ranked AS (
       |  SELECT q_id, vec_id AS neighbor_id, qdot,
       |    ${cosineSql("qe", "emb", "qn", "norm")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
       |      ${cosineSql("qe", "emb", "qn", "norm")} DESC, vec_id) AS rnk
       |  FROM cand)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, qdot, cosine
       |FROM ranked WHERE rnk <= $ArmTopK ORDER BY q_id, rnk""".stripMargin
  }

  // --- s5_ann_recall: ANN quality evaluation (recall@k vs exact) ----------
  // The operator every production ANN deployment runs continuously:
  // recall@k of the approximate index against the exact baseline on a
  // query sample. Composes s1 (ground truth) and s2 (LSH) as distributed
  // sub-plans — both sides stay DataFrames, the hit-join is on the tiny
  // (q_id, neighbor_id) result sets, and at 100 TB the query SAMPLE is
  // what's evaluated (both sub-plans broadcast the sample, never move the
  // vector table). Defined as ArmTopK so the evaluation depth can never
  // exceed what the arms serve (see ArmTopK's doc).
  val RecallK: Int = ArmTopK

  def s5AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = s1KnnBrute(s, dir).filter(col("rnk") <= RecallK)
      .select(col("q_id"), col("neighbor_id"))
    val approx = s2LshAnn(s, dir)
      .select(col("q_id"), col("neighbor_id"), lit(1L).as("hit"))
    // the served side is BOUNDED by construction (|S2Queries| queries x
    // ArmTopK rows), so the pinned broadcast is §5-legitimate — without
    // it the hit-join sits above two freshly-shuffled subtrees and
    // planned as a SortMergeJoin sorting both (round-14 plan audit;
    // same rationale as s9's served-union broadcast)
    exact.join(broadcast(approx), Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
           sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("k").cast("double"))
      .select("q_id", "k", "n_hit", "recall")
      .orderBy("q_id")
  }

  /** s1/s2 statements embedded as nested-WITH CTEs (DuckDB allows a full
    * WITH...SELECT inside a CTE body).
    */
  val s5Sql: String =
    s"""WITH exact AS ($s1Sql),
       |approx AS ($s2Sql)
       |SELECT e.q_id, COUNT(*) AS k,
       |  CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS recall
       |FROM (SELECT q_id, neighbor_id FROM exact WHERE rnk <= $RecallK) e
       |LEFT JOIN approx a ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin

  // --- s9_recall_matrix: continuous evaluation across ALL index arms ------
  // s5 evaluates the LSH arm; a production ANN platform evaluates EVERY
  // index architecture it serves, continuously, on each arm's own query
  // sample — the dashboard that catches a quietly-degrading index (drift,
  // a bad codebook, an unlucky plane bank) before users do. One operator:
  // per arm, exact brute-force top-RecallK ground truth on THAT arm's
  // query range, hit-join against the arm's served top-k, then ONE
  // micro-averaged recall per arm — aggregated as exact long counts
  // (sum(hits)/sum(k) in one final IEEE division; never a float mean, so
  // no sum-order nondeterminism). All five arms compose as distributed
  // sub-plans off the same scan lineage; the hit-joins touch only the
  // tiny per-query result sets, and at 100 TB each arm broadcasts its
  // query sample exactly as it does when serving.
  /** One row per served index arm — name, query-sample range, served
    * plan, oracle SQL (as a thunk: s7Sql/s8Sql are defined later in the
    * file and must not be forced at object init). `RecallArms`, the
    * served union, and the oracle's arm CTEs ALL derive from this list,
    * and the ranges are the same constants each arm's own filter
    * consumes — so adding an arm or moving a query sample cannot leave
    * the matrix half-updated with ground truth the arm never serves.
    */
  private val armRegistry: Seq[(String, (Long, Long),
      (SparkSession, String) => DataFrame, () => String)] = Seq(
    ("s2_lsh", S2Queries, s2LshAnn _, () => s2Sql),
    ("s3_ivf", S3Queries, s3IvfAnn _, () => s3Sql),
    ("s4_sq", S4Queries, s4SqAnn _, () => s4Sql),
    ("s7_multiprobe", S2Queries, s7Multiprobe _, () => s7Sql),
    ("s8_pq", S8Queries, s8PqAnn _, () => s8Sql))

  val RecallArms: Seq[(String, Long, Long)] =
    armRegistry.map { case (n, (lo, hi), _, _) => (n, lo, hi) }

  /** The union-of-ranges query predicate all arms' ground truth shares. */
  private def armRangesPred(c: Column): Column =
    RecallArms.map { case (_, lo, hi) => c >= lo && c < hi }.reduce(_ || _)

  /** Exact top-RecallK cosine ground truth for ALL arms' query ranges in
    * ONE brute pass (the shared [[bruteTopK]] subtree); s9RecallMatrix
    * holds exactly one instance of it in its plan.
    */
  private def bruteTopKAll(s: SparkSession, dir: String): DataFrame =
    bruteTopK(s, dir, armRangesPred(col("vec_id")), RecallK)
      .select(col("q_id"), col("neighbor_id"))

  private def bruteTopKAllSql: String = {
    val pred = RecallArms
      .map { case (_, lo, hi) => inRangeSql("q.vec_id", (lo, hi)) }
      .mkString(" OR ")
    s"SELECT q_id, neighbor_id FROM (\n${bruteTopKSql(pred, RecallK)})"
  }

  def s9RecallMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE exact subtree in the whole plan: exact rows replicate to their
    // arm(s) through a broadcast 5-row arm table, the five SERVED
    // sub-plans union into one tagged side, and a single hit-join scores
    // every arm. (Per-arm copies of the brute subtree re-ran the
    // crossJoin+rank per arm — a range filter on the window's partition
    // key pushes below the window and defeats exchange-level subtree
    // reuse; the tagged form measured 3.99 s → 1.23 s at sf0.1.)
    val armTable = broadcast(RecallArms.toDF("index", "lo", "hi"))
    val exactTagged = bruteTopKAll(s, dir)
      .join(armTable, col("q_id") >= col("lo") && col("q_id") < col("hi"))
      .select("index", "q_id", "neighbor_id")
    // rnk <= RecallK is structurally a no-op (arms serve ArmTopK =
    // RecallK rows by definition) — kept as the explicit contract guard
    val servedAll = armRegistry.map { case (name, _, plan, _) =>
      plan(s, dir).filter(col("rnk") <= RecallK)
        .select(lit(name).as("index"), col("q_id"), col("neighbor_id"),
                lit(1L).as("hit"))
    }.reduce(_ unionAll _)
    // the served side is BOUNDED by construction (5 arms × 5-query
    // samples × rnk ≤ RecallK = ≤ 75 rows at any corpus size), so the
    // pinned hint is §5-legitimate — and needed: the hit-join sits above
    // two freshly-shuffled unions and came out a SortMergeJoin
    exactTagged.join(broadcast(servedAll), Seq("index", "q_id", "neighbor_id"), "left")
      .groupBy("index")
      .agg(countDistinct(col("q_id")).as("n_queries"),
           count(lit(1)).as("k_total"),
           sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("k_total").cast("double"))
      .select("index", "n_queries", "k_total", "n_hit", "recall")
      .orderBy("index")
  }

  lazy val s9Sql: String = {
    val armValues = RecallArms
      .map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")
    val servedUnion = armRegistry.map { case (name, _, _, served) =>
      s"""SELECT '$name' AS index, q_id, neighbor_id
         |FROM (${served()}) WHERE rnk <= $RecallK""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $normedSql,
       |exact AS ($bruteTopKAllSql),
       |arms(index, lo, hi) AS (VALUES $armValues),
       |tagged AS (
       |  SELECT a.index, e.q_id, e.neighbor_id
       |  FROM exact e JOIN arms a ON e.q_id >= a.lo AND e.q_id < a.hi),
       |served AS (
       |$servedUnion
       |)
       |SELECT t.index, CAST(COUNT(DISTINCT t.q_id) AS BIGINT) AS n_queries,
       |  COUNT(*) AS k_total,
       |  CAST(SUM(CASE WHEN sv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(SUM(CASE WHEN sv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS recall
       |FROM tagged t LEFT JOIN served sv
       |  ON sv.index = t.index AND sv.q_id = t.q_id
       |  AND sv.neighbor_id = t.neighbor_id
       |GROUP BY t.index ORDER BY t.index""".stripMargin
  }

  // --- s6_mips_topk: max-inner-product retrieval --------------------------
  // The retrieval scoring the cosine family doesn't cover: recommendation
  // and two-tower models rank by the RAW dot product (magnitude carries
  // signal — popularity, confidence), not the normalized angle. Same
  // broadcast-query + per-partition-fold shape as s1: the vector table
  // never moves, queries broadcast, the dot is the single fused native
  // loop, top-k via window. (At 100 TB the standard MIPS-to-NN reductions
  // — augmenting a norm dimension so cosine indexes serve MIPS — layer on
  // top of s2/s3's candidate generators; the exact scorer here is the
  // re-rank kernel those share.)
  def s6MipsTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("emb", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select("vec_id", "emb")
    val q = e.filter(inRange(col("vec_id"), S6Queries))
      .select(col("vec_id").as("q_id"), col("emb").as("qe"))
    val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", graft.functions.DotProduct(col("qe"), col("emb")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= ArmTopK)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("dot"))
      .orderBy("q_id", "rnk")
  }

  val s6Sql: String = {
    val dot =
      """list_reduce(list_prepend(0.0,
        |    list_transform(range(1, len(q.emb) + 1), i -> q.emb[i] * e.emb[i])),
        |    (acc, x) -> acc + x)""".stripMargin
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id, $dot AS dot
       |  FROM vecs q JOIN vecs e ON e.vec_id <> q.vec_id
       |  WHERE ${inRangeSql("q.vec_id", S6Queries)}),
       |ranked AS (
       |  SELECT q_id, neighbor_id, dot,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY dot DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, neighbor_id, dot FROM ranked
       |WHERE rnk <= $ArmTopK ORDER BY q_id, rnk""".stripMargin
  }

  // --- s7_multiprobe: multi-probe LSH — Hamming-1 probing of s2's bank ----
  // The recall/memory trade every production LSH deployment makes: instead
  // of adding hash TABLES to recover near-misses (each table is a full
  // re-bucketing of the corpus — at 100 TB, another corpus-sized index),
  // each query also probes the k buckets at Hamming distance 1 from its
  // home bucket (one sign-bit flip = the near-miss shapes a hyperplane
  // boundary creates). Candidate volume grows (k+1)×QUERY-side only — the
  // corpus stays bucketed ONCE in s2's exact layout; at scale the probe
  // list is a partition-pruned multi-get against the same bucket-partitioned
  // table, no second index. Probes are generated as a column-level
  // sequence+transform over the SAME adaptive k that sized the bank, so
  // the plan stays declarative end-to-end and the oracle replays it
  // k-generically. Each vector lives in exactly one bucket and the k+1
  // probe ids are distinct by construction, so no candidate dedup step is
  // needed. probe_dist (0 = home bucket, 1 = flipped) is kept in the
  // output: it is the recall-attribution signal an ANN operator reports.
  def s7Multiprobe(s: SparkSession, dir: String): DataFrame = {
    val n0 = normed(s, dir)
    val nRow = n0.groupBy().agg(count(lit(1)).as("n_vec"))
    val e = n0.crossJoin(broadcast(nRow))
      .withColumn("k", s2KCol)
      .withColumn("bucket", bucketCol(col("k")))
      .drop("n_vec")
    val q = e.filter(inRange(col("vec_id"), S2Queries))
      .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"), col("k"),
              col("emb").as("qe"), col("norm").as("qn"))
      .withColumn("probe", explode(expr(
        "concat(array(q_bucket), transform(sequence(0, k - 1)," +
          " i -> q_bucket ^ shiftleft(CAST(1 AS BIGINT), i)))")))
      .drop("k")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    e.drop("k").join(broadcast(q),
        col("bucket") === col("probe") && col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosine(col("qe"), col("emb"), col("qn"), col("norm")))
      .withColumn("probe_dist",
        when(col("bucket") === col("q_bucket"), lit(0L)).otherwise(lit(1L)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= ArmTopK)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
              col("probe_dist"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val s7Sql: String =
    s"""WITH $normedSql,
       |$s2ParamsSql,
       |bucketed AS (
       |  SELECT vec_id, emb, norm,
       |    CAST(${bucketSqlExpr("emb")} AS BIGINT) AS bucket
       |  FROM normed, params),
       |probes AS (
       |  SELECT q.vec_id AS q_id, q.bucket AS q_bucket, q.emb AS qe, q.norm AS qn,
       |    unnest(list_prepend(q.bucket,
       |      list_transform(range(0, k),
       |        i -> xor(q.bucket, CAST(1 AS BIGINT) << i)))) AS probe
       |  FROM bucketed q, params WHERE ${inRangeSql("q.vec_id", S2Queries)}),
       |scored AS (
       |  SELECT p.q_id, e.vec_id AS neighbor_id,
       |    CAST(CASE WHEN e.bucket = p.q_bucket THEN 0 ELSE 1 END AS BIGINT) AS probe_dist,
       |    ${cosineSql("p.qe", "e.emb", "p.qn", "e.norm")} AS cosine
       |  FROM probes p JOIN bucketed e
       |    ON e.bucket = p.probe AND e.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, probe_dist, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, neighbor_id, probe_dist, cosine FROM ranked
       |WHERE rnk <= $ArmTopK ORDER BY q_id, rnk""".stripMargin

  // --- s8_pq_ann: product-quantization ADC retrieval ----------------------
  // The memory arm the s-family still lacked: s4's scalar quantization
  // compresses 4-8× but still stores a code PER DIMENSION; product
  // quantization (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", TPAMI 2011 — the FAISS IndexPQ architecture) stores
  // ONE byte per subspace: 64 floats (256 B) become PqM = 8 codes (8 B),
  // a 32× cut, which is what lets a 100 TB embedding corpus keep its
  // whole index resident. The scan side ranks candidates WITHOUT ever
  // touching a raw vector: queries precompute a (PqM × PqK) distance
  // table to every centroid subvector, and the asymmetric distance of a
  // corpus vector is PqM table lookups summed — the ADC scan reads only
  // the 8-byte code arrays, and only the ~PqCandidates winners' raw
  // vectors are fetched (a broadcast join-back on vec_id) for the exact
  // cosine re-rank. "Training" is deterministic per the s3 doctrine: the
  // codebook is the first PqK vectors' subvectors (riding the plan as a
  // broadcast 1-row aggregate, never a driver collect), so the oracle
  // replays the exact pipeline. Encode picks argmin_j of
  // ||c_mj||² − 2·e_m·c_mj (the true-L2² rank with the row-constant
  // ||e_m||² dropped; first-min wins on ties) — both engines evaluate the
  // identical IEEE expression via the same left-to-right folds, so codes,
  // distance tables and ADC sums are bit-exact.
  val PqM = 8
  val PqSub: Int = Dims / PqM
  val PqK = 16
  val PqCandidates = 20

  /** 1-row broadcast codebook: the first PqK vectors, vec_id-ordered. */
  private def pqCodebook(s: SparkSession, dir: String): DataFrame =
    normed(s, dir).filter(col("vec_id") < PqK)
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(vec_id, emb))), x -> x.emb)")
        .as("cb"))

  /** Test surface: the codebook vectors' own codes — each must
    * self-encode to its own index in every subspace (its true distance
    * to itself is 0, the unique minimum for distinct centroids).
    */
  def s8SelfEncode(s: SparkSession, dir: String): DataFrame =
    normed(s, dir).filter(col("vec_id") < PqK)
      .crossJoin(broadcast(pqCodebook(s, dir)))
      .select(col("vec_id"), pqCodes(col("emb"), col("cb")).as("codes"))
      .orderBy("vec_id")

  /** PQ codes: one argmin per subspace over score ||c_mj||² − 2·e_m·c_mj,
    * first-min wins — the native fused kernel (one eval per vector; the
    * HOF formulation of the same folds ran interpreted per lambda step,
    * ~15× slower on the corpus side). PqImpl.encode's strict-< tie rule
    * equals the oracle's list_position-of-list_min first match.
    */
  private def pqCodes(e: Column, cb: Column): Column =
    graft.functions.PqEncode(e, cb, PqSub)

  /** Query-side ADC distance table: dtab[m][j] = ||q_m − c_mj||² as a
    * left-to-right fold over the PqSub dims (query rows only — the
    * corpus never evaluates this).
    */
  private def pqDistTable(qe: Column, cb: Column): Column =
    transform(sequence(lit(0), lit(PqM - 1)), m =>
      transform(sequence(lit(0), lit(PqK - 1)), j => {
        val c = element_at(cb, j + lit(1))
        aggregate(sequence(lit(1), lit(PqSub)), lit(0.0), (acc, d) => {
          val diff = element_at(qe, m * lit(PqSub) + d) -
            element_at(c, m * lit(PqSub) + d)
          acc + diff * diff
        })
      }))

  /** Asymmetric distance: PqM table lookups folded in subspace order
    * (native — this runs once per corpus row per query).
    */
  private def pqAdc(dtab: Column, codes: Column): Column =
    graft.functions.PqAdc(dtab, codes)

  def s8PqAnn(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir)
    val cbRow = pqCodebook(s, dir)
    val enc = e.crossJoin(broadcast(cbRow))
      .select(col("vec_id"), pqCodes(col("emb"), col("cb")).as("codes"))
    val q = e.filter(inRange(col("vec_id"), S8Queries))
      .crossJoin(broadcast(cbRow))
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("norm").as("qn"),
              pqDistTable(col("emb"), col("cb")).as("dtab"))
    val wCand = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id"))
    // the rank exchange moves (q_id, vec_id, adist) triplets ONLY — the
    // 1 KB distance table and raw query vectors must not ride through
    // the shuffle (they re-attach from the 5-row broadcast afterwards)
    val cand = enc.crossJoin(broadcast(q.select("q_id", "dtab")))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pqAdc(col("dtab"), col("codes")).as("adist"))
      .withColumn("crnk", row_number().over(wCand))
      .filter(col("crnk") <= PqCandidates)
      .select("q_id", "vec_id", "adist")
    // exact re-rank fetches ONLY the candidates' raw vectors (tiny
    // broadcast side), never the corpus — the ADC scan saw codes alone
    val wTop = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    e.join(broadcast(cand), "vec_id")
      .join(broadcast(q.select("q_id", "qe", "qn")), "q_id")
      .withColumn("cosine", cosine(col("qe"), col("emb"), col("qn"), col("norm")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= ArmTopK)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
              col("adist"), col("cosine"))
      .orderBy("q_id", "rnk")
  }

  val s8Sql: String = {
    def fold(terms: String): String =
      s"""list_reduce(list_prepend(0.0, $terms), (acc, x) -> acc + x)"""
    // score(m, j) over alias `emb` — identical parenthesization to pqScore
    val scoreSql =
      s"""(${fold(s"list_transform(range(1, ${PqSub + 1}), d -> cb[j+1][m*$PqSub+d] * cb[j+1][m*$PqSub+d])")}
         | - (2.0 * ${fold(s"list_transform(range(1, ${PqSub + 1}), d -> emb[m*$PqSub+d] * cb[j+1][m*$PqSub+d])")}))""".stripMargin
    val scoresSql = s"list_transform(range(0, $PqK), j -> $scoreSql)"
    val dtabSql =
      s"""list_transform(range(0, $PqM), m -> list_transform(range(0, $PqK), j ->
         |  ${fold(s"list_transform(range(1, ${PqSub + 1}), d -> (emb[m*$PqSub+d] - cb[j+1][m*$PqSub+d]) * (emb[m*$PqSub+d] - cb[j+1][m*$PqSub+d]))")}))""".stripMargin
    val adistSql =
      fold(s"list_transform(range(1, ${PqM + 1}), m -> q.dtab[m][e.codes[m] + 1])")
    s"""WITH $normedSql,
       |cbrow AS (
       |  SELECT list(emb ORDER BY vec_id) AS cb FROM normed WHERE vec_id < $PqK),
       |enc AS (
       |  SELECT vec_id, list_transform(range(0, $PqM), m ->
       |    list_position($scoresSql, list_min($scoresSql)) - 1) AS codes
       |  FROM normed, cbrow),
       |q AS (
       |  SELECT vec_id AS q_id, emb AS qe, norm AS qn, $dtabSql AS dtab
       |  FROM normed, cbrow
       |  WHERE ${inRangeSql("vec_id", S8Queries)}),
       |cand AS (
       |  SELECT * FROM (
       |    SELECT q.q_id, e.vec_id, q.qe, q.qn, $adistSql AS adist,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |                         ORDER BY $adistSql ASC, e.vec_id) AS crnk
       |    FROM enc e CROSS JOIN q WHERE e.vec_id <> q.q_id)
       |  WHERE crnk <= $PqCandidates),
       |ranked AS (
       |  SELECT c.q_id, c.vec_id AS neighbor_id, c.adist,
       |    ${cosineSql("c.qe", "n.emb", "c.qn", "n.norm")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY
       |      ${cosineSql("c.qe", "n.emb", "c.qn", "n.norm")} DESC, c.vec_id) AS rnk
       |  FROM cand c JOIN normed n ON n.vec_id = c.vec_id)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, adist, cosine
       |FROM ranked WHERE rnk <= $ArmTopK ORDER BY q_id, rnk""".stripMargin
  }

  // --- s10_knn_graph: batch k-NN graph over the WHOLE corpus --------------
  // The offline indexing job the serving arms (5-query samples) don't
  // cover: every vector's top-GraphK in-bucket neighbors — the primitive
  // under embedding-based curation (SemDeDup-style cluster pruning,
  // density/diversity sampling, d7-style duplicate-graph seeds). Shape at
  // 100 TB: the corpus is bucketed ONCE by s2's adaptive sign-LSH (the
  // same bank the serving arms probe, so graph and serving rank
  // identically), the self-join keys on bucket, and candidate volume is
  // n·E[bucket], held flat by the adaptive k. The top-k window
  // partitions by (bucket, vec_id): a vector lives in exactly ONE
  // bucket, so the rank equals per-vec_id rank — and in the regime where
  // the join runs as a bucket-keyed shuffle join (the 100 TB shape; at
  // the test SFs Catalyst broadcasts the tiny neighbor side instead),
  // HashPartitioning(bucket) already satisfies the window's clustering,
  // so ranking rides the join's exchange rather than adding its own. At
  // scale the bucketed table is written bucketCol-bucketed like a25's
  // store and even that exchange disappears. Singleton-bucket vectors
  // yield no rows (no candidates), same as the oracle's join semantics.
  //
  // Round 10 measured the ceiling this operator used to carry: with k
  // CLAMPED at kmax = 8, E[bucket] resumed growing ∝ n past
  // n = 2^kmax·256 and the in-bucket cosine count grew n²/2^k. Round 11
  // first REMOVED the clamp (see the s2 block comment / SignLshBucket):
  // k = max(kmin, bitLength(n/256)) uncapped, planes generated on
  // demand, so E[bucket] stays pinned in [128, 256) at any corpus size.
  // Then the round's executed-plan audit (ProbeExec, tier160) showed
  // that pinning the MEAN is not enough: the quadratic candidate mass
  // Σ|b|² is dominated by the skew tail, because near-duplicate
  // clusters — which every training corpus has, and which sign-LSH by
  // design co-buckets — share one bucket at ANY plane count (nearly
  // identical vectors have identical sign patterns; more planes split
  // distinct directions, never copies). Measured (ProbeBuckets):
  // E[bucket] = 156 at every tier, but max|bucket| 1.8k→3.3k→6.0k and
  // Σ|b|² 53M→165M→538M across tier40/80/160 (e ≈ 1.7 per doubling) —
  // the in-bucket self-join emitted 1.08e9 rows at tier160 and the
  // top-k sort spilled 33 GB.
  //
  // The fix is the same doctrine as d2/d4's df-capped kernel: BOUND the
  // per-vector candidate set deterministically. Within each bucket,
  // rank members by vec_id (pos), and let a vector's candidates be the
  // members within S10BandW positions on either side. Executed as a
  // band join — band = (pos-1) div W; the probe side explodes to its
  // own + adjacent bands, the join keys on (bucket, band), and the
  // |Δpos| ≤ W filter trims the corners. Δpos ≤ W implies band
  // distance ≤ 1, so the band join loses nothing: the candidate set is
  // exactly {Δpos ≤ W}. Properties:
  //  - EXACT in-bucket top-k whenever |bucket| ≤ W+1. W = 512 =
  //    2·S2BucketTarget (round 12; was 256): the adaptive k pins
  //    E[bucket] ∈ [128, 256), so at W = 256 a bucket near the top of a
  //    k-band (E ≈ 230–255, σ = √E ≈ 16) crossed W+1 on ordinary
  //    Poisson fluctuation — truncation in the uniform regime, not just
  //    on clusters (the r11 comment overclaimed "entire uniform
  //    regime"). At W = 512 a uniform bucket needs a ≥ 16σ excursion to
  //    truncate, so the truncation regime is, to within e⁻¹⁰⁰-class
  //    events, exactly the cluster-skew tail: near-duplicate groups
  //    that co-bucket at any plane count. There any W neighbors are
  //    near-ties of the true top-k — a claim MEASURED, not asserted,
  //    since round 12: BAND_RECALL.json records banded-vs-exact
  //    recall@GraphK and cosine regret on the skewed tiers, and
  //    BandedBucketSpec pins a floor on a synthetic cluster corpus.
  //  - Every join group is ≤ W rows BY CONSTRUCTION — skew is
  //    eliminated structurally, not mitigated: per-vector work ≤ 2W
  //    candidates, total scoring CPU ≤ 2W·n at any corpus shape, and
  //    the top-k sort input is bounded the same way (no spill).
  //  - One extra linear shuffle (the pos window by bucket) vs the old
  //    plan; the downstream per-vec_id window rides Spark 4's partial
  //    WindowGroupLimit, which prunes to GraphK per vector below its
  //    exchange, so the final shuffle is ~3 rows per vector.
  // The oracle replays pos/band/Δpos verbatim, so the gate stays a
  // bit-exact replay at every tier.
  val GraphK = 3
  val S10BandW = 512

  def s10KnnGraph(s: SparkSession, dir: String): DataFrame =
    s10KnnGraphBanded(s, dir, S10BandW)

  /** The band width as a parameter — the shipped operator pins
    * w = S10BandW; BandRecall passes both the shipped width and an
    * effectively-infinite one (exact full in-bucket graph) to measure
    * what the band sacrifices on real skewed tiers.
    */
  /** Measured expansion of the banded join's DOWNSTREAM sort data over
    * the embeddings table's on-disk size. The round-14 tier640
    * executed-plan probe put the partial WindowGroupLimit's sort at a
    * ~21 GB footprint (11.8 GB peak + 9.15 GB spill over 323 M join
    * output rows) against 323 MB of embeddings parquet — ~65x. The
    * mechanism is the d4/d5 lesson one level up: AQE coalesces the
    * (bucket, band) exchanges by their SHUFFLED bytes (~2 GB
    * compressed), but the sort above them handles the join's ~80x
    * row fan-out, so the coalesced tasks under-provision ~10x and the
    * sort spills. 64 ≈ the measured expansion (the probe's footprint
    * includes sorter overhead that IS the quantity being sized for);
    * order-of-magnitude sizing only, same intent as
    * ShingleSortExpansion. Measured effect at t640: 160 partitions,
    * window-sort spill 9.15 GB -> 0, wall 85.5 -> 27.8 s.
    */
  private val S10BandSortExpansion = 64.0

  private[graft] def s10KnnGraphBanded(s: SparkSession, dir: String, bandW: Int): DataFrame = {
    val n0 = normed(s, dir)
    val nRow = n0.groupBy().agg(count(lit(1)).as("n_vec"))
    val e = n0.crossJoin(broadcast(nRow))
      .withColumn("bucket", bucketCol(s2KCol))
      .drop("n_vec", "label")
    val p = e.withColumn("pos", row_number().over(
        Window.partitionBy("bucket").orderBy("vec_id")).cast("long"))
      .withColumn("band", expr(s"(pos - 1) div ${bandW.toLong}"))
    // size the join-key exchanges to the banded-mass sort they feed
    // (round 14): an explicit count on BOTH sides pins co-partitioning
    // for the join AND keeps AQE from coalescing the downstream
    // window-limit sort into spilling tasks (see S10BandSortExpansion);
    // None at small SFs — plans there keep AQE coalescing, unchanged
    val sized = Dedup.sizedPartitions(s,
      Dedup.tableFileBytes(s, dir, "embeddings") * S10BandSortExpansion)
    val probe0 = p.withColumn("pband",
      explode(array(col("band") - 1, col("band"), col("band") + 1)))
    val probe = sized.fold(probe0)(
      probe0.repartition(_, col("bucket"), col("pband")))
    val nbrs0 = p.select(col("vec_id").as("nb_id"), col("bucket").as("nb_bucket"),
      col("band").as("nb_band"), col("pos").as("nb_pos"),
      col("emb").as("nb_emb"), col("norm").as("nb_norm"))
    val nbrs = sized.fold(nbrs0)(
      nbrs0.repartition(_, col("nb_bucket"), col("nb_band")))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("nb_id"))
    probe.join(nbrs,
        col("bucket") === col("nb_bucket") && col("pband") === col("nb_band"))
      .filter(col("vec_id") =!= col("nb_id") &&
        abs(col("pos") - col("nb_pos")) <= bandW.toLong)
      .withColumn("cosine", cosine(col("emb"), col("nb_emb"), col("norm"), col("nb_norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= GraphK)
      .select(col("vec_id"), col("rnk"), col("nb_id").as("neighbor_id"), col("cosine"))
      .orderBy("vec_id", "rnk")
  }

  val s10Sql: String =
    s"""WITH $normedSql,
       |$s2ParamsSql,
       |bucketed AS (
       |  SELECT vec_id, emb, norm,
       |    CAST(${bucketSqlExpr("emb")} AS BIGINT) AS bucket
       |  FROM normed, params),
       |pos AS (
       |  SELECT vec_id, emb, norm, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS pos
       |  FROM bucketed),
       |scored AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |    ${cosineSql("a.emb", "b.emb", "a.norm", "b.norm")} AS cosine
       |  FROM pos a JOIN pos b
       |    ON b.bucket = a.bucket AND b.vec_id <> a.vec_id
       |    AND abs(a.pos - b.pos) <= $S10BandW),
       |ranked AS (
       |  SELECT vec_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT vec_id, rnk, neighbor_id, cosine FROM ranked
       |WHERE rnk <= $GraphK ORDER BY vec_id, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s6_mips_topk" -> (s6MipsTopk _),
    "s10_knn_graph" -> (s10KnnGraph _),
    "s8_pq_ann" -> (s8PqAnn _),
    "s9_recall_matrix" -> (s9RecallMatrix _),
    "s1_knn_brute" -> (s1KnnBrute _),
    "s2_lsh_ann" -> (s2LshAnn _),
    "s3_ivf_ann" -> (s3IvfAnn _),
    "s4_sq_ann" -> (s4SqAnn _),
    "s5_ann_recall" -> (s5AnnRecall _),
    "s7_multiprobe" -> (s7Multiprobe _),
  )

  val oracles: Map[String, String] = Map(
    "s6_mips_topk" -> s6Sql,
    "s10_knn_graph" -> s10Sql,
    "s8_pq_ann" -> s8Sql,
    "s9_recall_matrix" -> s9Sql,
    "s1_knn_brute" -> s1Sql,
    "s2_lsh_ann" -> s2Sql,
    "s3_ivf_ann" -> s3Sql,
    "s4_sq_ann" -> s4Sql,
    "s5_ann_recall" -> s5Sql,
    "s7_multiprobe" -> s7Sql,
  )
}

package graft

/** Typed error surface, the Spark-library counterpart of the reference's
  * exception hierarchy (deker_server_adapters/errors.py): callers get
  * specific, catchable failures instead of bare IllegalArgument /
  * AnalysisException leaks.
  */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

/** Invalid subset bounds (mirrors the server's 4xx on a bad slice). */
final class GraftBoundsError(msg: String) extends GraftException(msg)

/** Requested subset exceeds the configured cell budget — the client-side
  * analogue of CONTENT_TOO_LARGE / "use smaller subset"
  * (consts.py TOO_LARGE_ERROR_MESSAGE): callers should chunk via
  * ArrayOps.chunkedSliceRead.
  */
final class GraftSubsetTooLargeError(msg: String) extends GraftException(msg)

/** A multimodal payload failed to parse — bad magic, malformed header, or
  * a raster shorter than the header promises. Typed so a pipeline can
  * route undecodable records to a quarantine sink instead of letting an
  * opaque executor exception kill the batch.
  */
final class GraftMediaDecodeError(msg: String) extends GraftException(msg)

/** A query action exceeded its deadline — the engine-side analogue of the
  * reference's 504 surface (errors.py:52 DekerTimeoutServer, consts.py:10
  * TIMEOUT). Raised by [[Errors.withTimeout]], which CANCELS the
  * in-flight Spark jobs rather than merely abandoning them.
  */
final class GraftTimeoutError(msg: String) extends GraftException(msg)

/** The session or its store failed the liveness probe — the analogue of
  * the reference's ping-at-startup contract (cluster_config.py:85-97:
  * "Healthcheck failed. Deker client will be closed.", errors.py:85
  * HealthcheckError).
  */
final class GraftHealthcheckError(msg: String) extends GraftException(msg)

/** Id-addressed lookup rejected in cluster mode — errors.py:89
  * FilteringByIdInClusterIsForbidden: when a collection has primary
  * attributes, cluster placement is keyed by them, so an id filter cannot
  * be routed; callers must address by primary attributes (a7's path).
  */
final class GraftIdFilterForbiddenError(msg: String) extends GraftException(msg)

/** Per-request data-points quota exceeded — the reference's third
  * flow-control flavor (errors.py:77 DekerDataPointsLimitError, raised at
  * httpx_client.py:59 on a 413 whose body is NOT the memory error),
  * distinct from the subset cell budget ([[GraftSubsetTooLargeError]])
  * and the 429 request rate (a18/st6's relational models). Carries the
  * limiter fields the reference lifts from the RateLimit-* headers
  * (errors.py:57-72).
  */
final class GraftDataPointsLimitError(
    msg: String,
    val limit: Option[Long] = None,
    val remaining: Option[Long] = None,
    val reset: Option[Long] = None) extends GraftException(msg)

object Errors {
  def requireBounds(b0: (Long, Long), b1: (Long, Long)): Unit = {
    if (b0._1 > b0._2 || b1._1 > b1._2)
      throw new GraftBoundsError(
        s"bounds must be (lo, hi) with lo <= hi: got $b0, $b1")
    if (b0._1 < 0 || b1._1 < 0)
      throw new GraftBoundsError(s"bounds must be non-negative: got $b0, $b1")
  }

  def requireStep(step: Long): Unit =
    if (step < 1)
      throw new GraftBoundsError(s"slice step must be >= 1: got $step")

  /** Reject a request whose selected-point count exceeds the per-request
    * quota. remaining=0 mirrors the reference's header-derived field: the
    * budget is fully consumed by the rejected request, and the caller's
    * recovery is chunking (ArrayOps.chunkedSliceRead), not waiting.
    */
  def requirePoints(points: Long, quota: Long): Unit =
    if (points > quota)
      throw new GraftDataPointsLimitError(
        s"request selects $points data points, per-request quota is $quota" +
          " — use a smaller subset or chunked reads",
        limit = Some(quota), remaining = Some(0L), reset = None)

  private val deadlineSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Deadline guard around a query ACTION. Spark-native enforcement: the
    * op runs inside a job group with interruptOnCancel and a watchdog
    * cancels the whole group at the deadline — executors stop burning the
    * cluster, matching the server's behavior of killing the request at
    * 504, not the client silently walking away. Job groups are
    * thread-local, so `op` must perform its actions on the calling thread
    * (every graft operator does).
    */
  def withTimeout[T](s: org.apache.spark.sql.SparkSession, budgetMs: Long)
                    (op: => T): T = {
    val sc = s.sparkContext
    val tag = s"graft-deadline-${deadlineSeq.incrementAndGet()}"
    @volatile var fired = false
    val timer = new java.util.Timer("graft-deadline", true)
    sc.setJobGroup(tag, s"graft deadline ${budgetMs}ms", interruptOnCancel = true)
    try {
      timer.schedule(new java.util.TimerTask {
        override def run(): Unit = { fired = true; sc.cancelJobGroup(tag) }
      }, budgetMs)
      try op
      catch {
        case e: Throwable if fired =>
          throw new GraftTimeoutError(
            s"query exceeded its ${budgetMs}ms deadline and was cancelled: ${e.getMessage}")
      }
    } finally { timer.cancel(); sc.clearJobGroup() }
  }

  /** Store tables a healthy session must be able to reach. */
  private[graft] val StoreTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Liveness probe: session running and every store table reachable.
    * Raises the typed healthcheck error with the full missing list — the
    * reference closes the client on a failed ping; a library caller
    * decides that policy, but gets the same typed signal.
    */
  def healthcheck(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    if (s.sparkContext.isStopped)
      throw new GraftHealthcheckError("healthcheck failed: spark context is stopped")
    val missing = StoreTables.filterNot(t =>
      new java.io.File(s"$dir/$t.parquet").exists())
    if (missing.nonEmpty)
      throw new GraftHealthcheckError(
        s"healthcheck failed: store $dir is missing ${missing.mkString(", ")}")
  }

  /** Cluster-mode addressing constraint (errors.py:89): a collection with
    * primary attributes must be looked up by them in cluster mode — id
    * placement is undefined across the ring.
    */
  def requireIdFilterAllowed(clusterMode: Boolean, hasPrimaryAttrs: Boolean): Unit =
    if (clusterMode && hasPrimaryAttrs)
      throw new GraftIdFilterForbiddenError(
        "collection has primary attributes in the schema; filtering by id " +
          "is not allowed in cluster mode — use primary attributes")
}

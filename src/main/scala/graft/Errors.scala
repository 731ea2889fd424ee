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
}

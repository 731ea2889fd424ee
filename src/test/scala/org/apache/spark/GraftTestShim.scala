package org.apache.spark

/** Test-only bridge to package-private SparkContext internals. */
object GraftTestShim {
  /** Block until all queued listener events have been delivered, so a
    * SparkListener-based assertion sees every job the test triggered.
    */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

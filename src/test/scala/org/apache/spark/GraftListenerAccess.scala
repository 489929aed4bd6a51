package org.apache.spark

/** Test-only bridge to the private[spark] listener bus, so job-count
 *  assertions can drain pending events deterministically instead of
 *  sleeping. */
object GraftListenerAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}

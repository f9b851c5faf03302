package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` LiveListenerBus draining: the bench's
  * per-query shuffle attribution snapshots listener-accumulated stage
  * metrics at query boundaries, and stage-completion events are delivered
  * asynchronously — without a drain, a query's last stages could be
  * credited to the next query. `waitUntilEmpty` returns immediately when
  * the bus is already drained (the common case), so the sync point costs
  * nothing measurable. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(10000L)
}

package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` scheduler internals: draining the
  * listener bus makes job-count assertions deterministic (listener events
  * are delivered asynchronously).
  */
object TestBridge {
  def waitForListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

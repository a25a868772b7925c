package org.apache.spark

/** Test-only access to `private[spark]` internals: flush the listener
  * bus so a spec can assert on job counts deterministically. */
object GraftTestShim {
  def waitListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

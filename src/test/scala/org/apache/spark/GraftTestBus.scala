package org.apache.spark

/** Test-only bridge: deterministically drain the listener bus so metrics
  * accumulated by a test SparkListener are complete before asserting
  * (listenerBus is private[spark]). */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

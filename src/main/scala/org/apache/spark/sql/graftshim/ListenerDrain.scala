package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/**
 * Flush the async listener bus so a measurement listener has seen
 * every event from the jobs that already returned — `listenerBus` is
 * `private[spark]`, hence this one-line shim. Used by the scaling
 * harness's driver-result-bytes watch: without the drain, a gate's
 * task-result bytes could be attributed to the NEXT gate's window.
 */
object ListenerDrain {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

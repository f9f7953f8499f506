package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` core APIs — same escape-hatch pattern as
  * `org.apache.spark.sql.graftbridge.Bridge`, for the non-SQL side.
  */
object CoreBridge {

  /** Block until the listener bus has delivered every queued event.
    * Required for exact per-query attribution of SparkListener task
    * metrics: `onTaskEnd` fires asynchronously on the bus, so a
    * snapshot taken right after an action can miss the last tasks'
    * metrics (they would leak into the NEXT query's window).
    */
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

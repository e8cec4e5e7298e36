package org.apache.spark

/** Bridge into Spark's `private[spark]` listener-bus drain.
  *
  * The live listener bus is asynchronous: metrics listeners (e.g. the
  * shuffle-volume receipt in [[graft.ScaleProbe]]'s cc-probe) can have
  * StageCompleted events still queued when the measured job returns.
  * Spark's own tests synchronize with `listenerBus.waitUntilEmpty()`,
  * but both the bus and the method are `private[spark]` — this is the
  * documented one-hop accessor (the [[org.apache.spark.sql.GraftBridge]]
  * technique), replacing a fixed sleep that under load could snapshot
  * counters before the queue drained. */
object GraftListenerBridge {
  /** Block until every event posted so far has been delivered to all
    * listeners (bounded by `timeoutMillis` — returns normally either
    * way; a drain timeout means an overloaded bus, and the caller's
    * snapshot is then best-effort exactly as the old sleep was). */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}

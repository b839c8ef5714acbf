package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for zero-job assertions.
  *
  * Specs that assert "this construction scheduled no Spark jobs"
  * observe the ASYNC listener bus; a fixed `Thread.sleep` after the
  * construction is a race — on a loaded box a job-start event arriving
  * after the sleep yields a false PASS (the r12 advice on
  * BandedHammingSpec). `listenerBus.waitUntilEmpty` is the precise
  * barrier but is `private[spark]`, hence this shim.
  */
object ListenerSync {

  /** Block until every queued listener event has been delivered (or
    * the timeout elapses — then TimeoutException, failing the spec
    * loudly instead of passing vacuously). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

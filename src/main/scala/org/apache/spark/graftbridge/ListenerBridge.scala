package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus internals: a deterministic
  * "all posted events delivered" barrier. The offload runner's transport
  * accounting previously POLLED its listener counter with 50 ms sleeps
  * (~100–200 ms of pure sleep per offload, and a settle heuristic that
  * is in principle racy); `waitUntilEmpty` is the engine's own exact
  * primitive for the same thing. */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

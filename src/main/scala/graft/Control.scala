package graft

/** Cooperative stop flag for the engine's daemon loops (ingest, compactor)
  * — the reference's SIGINT/SIGTERM handler (/root/reference/src/
  * utils.rs:5-31) sets an atomic that loops check between cycles; here
  * `stop()` also wakes the inter-tick sleep immediately so shutdown never
  * waits out the cadence, and `awaitExit` lets a shutdown hook hold the
  * JVM open until the in-flight cycle drains (a half-written parquet job
  * is what "graceful" must prevent). */
final class DaemonControl {
  private val lock = new Object
  private val exited = new java.util.concurrent.CountDownLatch(1)
  @volatile private var stopRequested = false
  def stop(): Unit = lock.synchronized { stopRequested = true; lock.notifyAll() }
  def isStopped: Boolean = stopRequested
  /** Block until the run loop has exited (true) or timeout (false). */
  def awaitExit(timeoutMillis: Long): Boolean =
    exited.await(timeoutMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
  private[graft] def markExited(): Unit = exited.countDown()
  /** Sleep up to `ms` or until stopped; returns the stop flag. */
  private[graft] def awaitOrStop(ms: Long): Boolean = lock.synchronized {
    val deadline = System.nanoTime() + ms * 1000000L
    var left = ms
    while (!stopRequested && left > 0) {
      lock.wait(left)
      left = (deadline - System.nanoTime()) / 1000000L
    }
    stopRequested
  }
}

package graft

/** Cooperative stop flag for the engine's daemon loops (ingest, compactor)
  * — the reference's SIGINT/SIGTERM handler (/root/reference/src/
  * utils.rs:5-31) sets an atomic that loops check between cycles; here
  * `stop()` also wakes the inter-tick sleep immediately so shutdown never
  * waits out the cadence, and `awaitExit` lets a shutdown hook hold the
  * JVM open until every in-flight cycle drains (a half-written parquet
  * job is what "graceful" must prevent). One instance may be shared by
  * multiple loops: exit tracking is a counter, not a one-shot latch. */
final class DaemonControl {
  private val lock = new Object
  private var active = 0
  @volatile private var stopRequested = false

  def stop(): Unit = lock.synchronized { stopRequested = true; lock.notifyAll() }
  def isStopped: Boolean = stopRequested

  /** Block until every registered loop has exited (true) or timeout. */
  def awaitExit(timeoutMillis: Long): Boolean = lock.synchronized {
    val deadline = System.nanoTime() + timeoutMillis * 1000000L
    var left = timeoutMillis
    while (active > 0 && left > 0) {
      lock.wait(left)
      left = (deadline - System.nanoTime()) / 1000000L
    }
    active == 0
  }

  /** Run one daemon loop body under this control: registers the loop for
    * [[awaitExit]], optionally installs a JVM shutdown hook that requests
    * stop and holds the JVM open (bounded) until all loops drain, and
    * guarantees deregistration + hook removal on exit. Hoisted here so
    * the subtle parts (drain bound, removeShutdownHook during shutdown)
    * exist exactly once. */
  private[graft] def runGuarded[A](installShutdownHook: Boolean)(body: => A): A = {
    val hook = new Thread(() => { stop(); awaitExit(60000L); () })
    lock.synchronized { active += 1 }
    if (installShutdownHook) Runtime.getRuntime.addShutdownHook(hook)
    try body
    finally {
      lock.synchronized { active -= 1; lock.notifyAll() }
      if (installShutdownHook)
        try Runtime.getRuntime.removeShutdownHook(hook)
        catch { case _: IllegalStateException => () } // already shutting down
    }
  }

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

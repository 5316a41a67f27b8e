package graft

/** Bounded concurrent fan-out over independent units of driver-side work
  * (each unit typically submits its own Spark jobs — the scheduler is
  * thread-safe). The Spark analog of the reference's rayon scope
  * (/root/reference/src/bin/compactor.rs:76-94): output paths are disjoint
  * per unit, so no locking is needed; concurrency is what keeps more than
  * one core busy when each unit is a small (often single-task) job.
  */
object Par {

  /** Map `work` over `items` with at most `parallelism` concurrent units;
    * result preserves input order, `None` results are dropped.
    *
    * Failure semantics: ALL units are drained before this returns or
    * throws — a unit failure must not leave sibling writers running in the
    * background (a caller's retry would then race a leaked job for the
    * same output dir / committer `_temporary` path). The first failure is
    * rethrown with any further failures attached as suppressed. */
  def mapBounded[A, B](items: IndexedSeq[A], parallelism: Int = 8)(
      work: A => Option[B]): IndexedSeq[B] = {
    if (items.isEmpty) return IndexedSeq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, items.length)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fut = scala.concurrent.Future.traverse(items) { a =>
        scala.concurrent.Future(work(a)).transform(scala.util.Success(_))
      }
      val outcomes = scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration.Inf)
      val failures = outcomes.collect { case scala.util.Failure(e) => e }
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(first.addSuppressed)
        throw first
      }
      outcomes.collect { case scala.util.Success(Some(b)) => b }
    } finally pool.shutdown()
  }
}

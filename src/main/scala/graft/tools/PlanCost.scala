package graft.tools

/** Split a registry query's warm wall time into DRIVER work (analysis +
  * optimization + physical planning, measured by forcing
  * `queryExecution.executedPlan` on a fresh frame) and EXECUTION
  * (noop-forced run of an already-planned frame is not separable under
  * AQE, so execution here = full force minus a fresh plan's planning
  * time), plus per-run job/stage counts from a listener. The question
  * this answers (r20 optimization round, guide §1): with 146 queries
  * summing to ~75 s warm at sf0.1 over ~500-row fixtures, is the suite
  * execution-bound (exchanges, task dispatch) or driver-bound (plan
  * trees with 32-hash fan-outs, window chains)?
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PlanCost [sfDir] [n] [query...]"
  * (default: every registry query, n=2 warm reps after 1 discarded cold).
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
      }
    })
    println("query\tplan_ms\texec_ms\tjobs\tstages\ttasks")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        // cold run (codegen + caches), discarded
        graft.Bench.force(fn(spark, sfDir))
        val samples = (1 to n).map { _ =>
          // planning: fresh frame -> executedPlan (analysis/opt/physical;
          // AQE re-planning during execution is charged to exec)
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan
          val t1 = System.nanoTime()
          if (names.size <= 4) {
            val ph = df.queryExecution.tracker.phases
            System.err.println(s"[plancost-phases] $name " + ph.map { case (k, v) =>
              s"$k=${v.endTimeMs - v.startTimeMs}ms" }.mkString(" "))
          }
          jobs.set(0); stages.set(0); tasks.set(0)
          graft.Bench.force(df)
          val t2 = System.nanoTime()
          Thread.sleep(50) // let listener drain
          ((t1 - t0) / 1e6, (t2 - t1) / 1e6, jobs.get, stages.get, tasks.get)
        }
        val planMed = samples.map(_._1).sorted.apply(samples.size / 2)
        val execMed = samples.map(_._2).sorted.apply(samples.size / 2)
        val last = samples.last
        println(f"$name\t$planMed%.0f\t$execMed%.0f\t${last._3}\t${last._4}\t${last._5}")
      } catch {
        case e: Throwable =>
          println(s"$name\tERR\t${e.getClass.getSimpleName}\t-\t-\t-")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}

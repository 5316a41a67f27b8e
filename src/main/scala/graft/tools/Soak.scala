package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Long-lived-session soak: run the ENTIRE declared query set several
  * times in ONE JVM and report per-pass totals. This is the direct
  * regression harness for the r5 bench-session degradation (untouched
  * trivial queries inflating 3–10× as a 93-query session aged): with the
  * per-query hygiene (catalog cache clear + persistent-RDD sweep),
  * superseded-checkpoint release in connectedComponents, and bounded
  * status-store retention, pass N must cost the same as pass 1.
  *
  * Usage: `runMain graft.tools.Soak [sfDir] [passes]` — prints one line
  * per pass (total seconds, worst query, heap after sweep) and a final
  * PASS/FAIL verdict on the pass-over-pass ratio.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rt = Runtime.getRuntime
    val totals = (1 to passes).map { pass =>
      var worst = ("", 0.0)
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (name, fn) =>
        val q0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - q0) / 1e9
        if (dt > worst._2) worst = (name, dt)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      val total = (System.nanoTime() - t0) / 1e9
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      println(f"[soak] pass $pass/$passes total=$total%.1fs worst=${worst._1}:${worst._2}%.2fs heapMB=$heapMb rdds=${spark.sparkContext.getPersistentRDDs.size}")
      total
    }
    spark.stop()
    // pass 1 pays janino compilation for every generated stage; steady
    // state is pass 2+. Degradation = any later pass markedly worse than
    // pass 2 (1.5× leaves room for box noise; r5's signature was 2-10×).
    val steady = totals.drop(1)
    val verdict =
      if (steady.isEmpty || steady.max <= steady.min * 1.5) "SOAK PASS"
      else "SOAK FAIL"
    println(f"$verdict: passes=${totals.map(t => f"$t%.1f").mkString(",")}s")
  }
}

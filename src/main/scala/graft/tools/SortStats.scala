package graft.tools

/** Throwaway calibration: print each query's top-level global-Sort child
  * size estimate (bytes) so the smallsort threshold is picked from data. */
object SortStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(8)
    spark.conf.set("spark.graft.smallsort.maxBytes", "0")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val sorts = df.queryExecution.optimizedPlan.collect {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global =>
            s.child.stats.sizeInBytes
        }
        println(s"SORTSTATS $name ${sorts.mkString(",")}")
      } catch { case e: Throwable => println(s"SORTSTATS $name ERR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}

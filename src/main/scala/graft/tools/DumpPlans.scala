package graft.tools

/** Dump formatted physical plans for selected registry queries — the
  * `.explain("formatted")` audit loop the repo's plan-quality claims
  * (pushdown, broadcast, codegen spans) are checked against. Usage:
  * `runMain graft.tools.DumpPlans [sfDir] [queryName...]`. */
object DumpPlans {
  val defaults = Seq(
    "p06_filter_range", "j01_left_join", "j07_multiway_chain",
    "a01_groupby_sum", "dd_incremental", "ann_topk_brute",
    "w08_sessionize", "sql_timeseries_panel")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else defaults
    val spark = graft.GraftSession.local(8)
    // SPARK_GRAFT_CONF="k=v;k=v": session-conf overrides for before/after
    // plan dumps (same contract as ProbeQuery)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })
    names.foreach { n =>
      println(s"\n===PLAN=== $n")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

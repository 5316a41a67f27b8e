package graft.tools

/** Micro-probe for driver-side query-construction costs (r20): the
  * wall cost of `spark.read.parquet` (file listing + footer schema
  * inference) per table, of an `explodeWidth` stats read, and of a
  * representative operator-construction chain — the components of
  * PlanCost's plan_ms that Catalyst's own phase tracker does NOT see.
  * Usage: sbt "runMain graft.tools.ReadCost [sfDir]" */
object ReadCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[readcost] $label%-40s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    (1 to 3).foreach { i =>
      System.err.println(s"[readcost] --- round $i ---")
      val docs = t(s"read documents")(graft.Tables(spark, sfDir, "documents"))
      t(s"read lineitem")(graft.Tables(spark, sfDir, "lineitem"))
      t(s"read events")(graft.Tables(spark, sfDir, "events"))
      t(s"read embeddings")(graft.Tables(spark, sfDir, "embeddings"))
      t(s"explodeWidth(documents)")(graft.GraftSession.explodeWidth(docs))
      t(s"spread(documents)")(graft.GraftSession.spread(docs))
      t(s"minhashSignature construction")(
        graft.operators.Dedup.minhashSignature(docs, "doc_id", "text", 3, 32))
      val sig = graft.operators.Dedup.minhashSignature(docs, "doc_id", "text", 3, 16)
      t(s"executedPlan of signature")(sig.queryExecution.executedPlan)
    }
    spark.stop()
  }
}

package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for the r21 small-sort collapse: a global sort over a child
  * whose size estimate is under the threshold must plan as ONE
  * all-to-one exchange + local sort (no range exchange, no sampling
  * pass), with rows and ordering identical to the range-sort plan; a
  * sort whose child is unknown-sized/over-threshold, already
  * single-partition, or feeding a limit must be left alone. */
class SmallSortSinglePartitionSpec extends SparkSpec {

  private val Key = "spark.graft.smallsort.maxBytes"

  private def executedStr(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def disabled[A](f: => A): A = {
    spark.conf.set(Key, "0")
    try f finally spark.conf.unset(Key)
  }

  private def docs = {
    import spark.implicits._
    (0 until 500).map(i => (i.toLong, s"doc $i word${i % 7} tail"))
      .toDF("doc_id", "text")
  }

  // NOTE: a Dataset memoizes its QueryExecution, so every regime below
  // rebuilds the query AFTER setting the conf — reusing one Dataset
  // across conf flips would silently compare the same cached plan.
  test("small global sort collapses to a single-partition sort, same rows & order") {
    def q = docs.select(col("doc_id"), upper(col("text")).as("t"))
      .orderBy(col("t"), col("doc_id"))
    val collapsed = executedStr(q)
    assert(collapsed.contains("Exchange SinglePartition"),
      s"expected the all-to-one exchange:\n$collapsed")
    assert(!collapsed.contains("Exchange rangepartitioning"),
      s"range exchange should be gone:\n$collapsed")
    val got = q.collect().toSeq
    val want = disabled {
      val p = executedStr(q)
      assert(p.contains("Exchange rangepartitioning"),
        s"maxBytes=0 must reproduce the range-sort plan:\n$p")
      q.collect().toSeq
    }
    assert(got === want) // identical rows in identical order
  }

  test("sorts under a limit keep the TakeOrdered plan") {
    val q = docs.orderBy("text").limit(5)
    val p = executedStr(q)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("a global-aggregate child is left alone (already single-partition)") {
    val q = docs.agg(count(lit(1)).as("n"), sum("doc_id").as("s"))
      .orderBy("n")
    val p = executedStr(q)
    // the no-grouping aggregate plans its own ENSURE_REQUIREMENTS
    // SinglePartition exchange; the rule must not ADD a repartition
    // (REPARTITION_BY_NUM) or leave a range exchange
    assert(!p.contains("REPARTITION_BY_NUM"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("expensive projections stay BELOW the collapsed sort (defer ordering contract)") {
    // regexp is a DeferExpensiveSortProject gated class; with the small
    // sort collapsed there is no sampling pass, so the projection must
    // evaluate in parallel below the all-to-one exchange — NOT serially
    // above the single-partition sort (the reversed-registration hazard).
    // Read from parquet, not a local Seq: ConvertToLocalRelation folds a
    // projection over a LocalRelation into the scan and no ProjectExec
    // survives to observe.
    val pq = tmpDir("smallsort_pq")
    docs.write.mode("overwrite").parquet(pq)
    val q = spark.read.parquet(pq).select(col("doc_id"),
        regexp_replace(col("text"), "w.rd", "W").as("scrubbed"))
      .orderBy("doc_id")
    q.collect()
    val plan = q.queryExecution.executedPlan
    var sawExchange = false
    var projBelowExchange = false
    var projAboveSort = false
    def walk(n: org.apache.spark.sql.execution.SparkPlan, below: Boolean): Unit = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan, below)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(qs.plan, below)
      case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        sawExchange = true
        ex.children.foreach(walk(_, true))
      case p: org.apache.spark.sql.execution.ProjectExec =>
        val exp = p.projectList.exists(DeferExpensiveSortProject.isExpensive)
        if (exp && below) projBelowExchange = true
        if (exp && !below) projAboveSort = true
        p.children.foreach(walk(_, below))
      case other => other.children.foreach(walk(_, below))
    }
    walk(plan, below = false)
    assert(sawExchange, plan.toString)
    assert(projBelowExchange && !projAboveSort,
      s"regexp projection must sit below the all-to-one exchange:\n$plan")
  }

  test("a tiny threshold leaves the range sort in place") {
    spark.conf.set(Key, "1")
    try {
      val p = executedStr(docs.orderBy("doc_id"))
      assert(p.contains("Exchange rangepartitioning"), p)
    } finally spark.conf.unset(Key)
  }
}

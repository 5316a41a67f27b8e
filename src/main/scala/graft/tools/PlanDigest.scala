package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Canonical physical-plan SHAPE digest for the plan-golden regression
  * gate (PlanGoldenSpec): join strategies, exchange counts, scan counts
  * and pushed-filter presence, extracted from the EXECUTED adaptive
  * plan. The digest deliberately excludes partition counts, row counts
  * and object ids — anything AQE may retune per host — so it pins
  * exactly the decisions that matter at 100 TB (did the broadcast stay
  * a broadcast, did a new shuffle appear, did the filter still reach
  * the scan) and nothing that legitimately varies. */
object PlanDigest {

  /** Digest of `df`'s final executed plan. Runs the query (collect):
    * an unexecuted AdaptiveSparkPlan carries only the initial plan, and
    * the final plan is where AQE's join re-strategies and reused
    * exchanges become visible. */
  def digest(df: DataFrame): String = {
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // AdaptiveSparkPlan renders "== Final Plan ==" followed by
    // "== Initial Plan ==": measure the final section only, else every
    // feature double-counts (and pre-AQE shuffles that the runtime
    // removed would still be counted)
    val fin = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    def n(lit: String): Int = {
      var c = 0
      var i = fin.indexOf(lit)
      while (i >= 0) { c += 1; i = fin.indexOf(lit, i + lit.length) }
      c
    }
    val joins = Seq(
      "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct")
      .map(j => j -> n(j)).filter(_._2 > 0)
      .map { case (j, c) => s"$j=$c" }.mkString(",")
    // deliberately NOT counted: BroadcastExchange / ReusedExchange. Their
    // final-plan rendering depends on cross-query materialization state
    // (a broadcast feeding a BHJ over an already-materialized cached
    // stage can drop its own exchange line), so counts drift with suite
    // order while nothing about the query's plan regressed. A LOST
    // broadcast still fails the gate — the join strategy itself moves
    // out of joins[] (BroadcastHashJoin → SortMergeJoin).
    val xchg = Seq(
      "hash" -> n("Exchange hashpartitioning"),
      "range" -> n("Exchange rangepartitioning"),
      "single" -> n("Exchange SinglePartition"))
      .map { case (k, c) => s"$k=$c" }.mkString(",")
    val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(fin).length
    s"joins[$joins] xchg[$xchg] scans=${n("FileScan")} " +
      s"local=${n("LocalTableScan")} inmem=${n("InMemoryTableScan")} " +
      s"pushed=$pushed defer=${expensiveBelowRange(df.queryExecution.executedPlan)}"
  }

  /** Count of gated-class expensive projections (regex / JSON / split /
    * timestamp-format / lambda / UDF — [[graft.plans
    * .DeferExpensiveSortProject.isExpensive]]) sitting in `Project`
    * nodes BELOW a range-partitioning exchange in the final executed
    * plan. The range exchange's bounds sampler executes its subtree
    * twice, so an expensive projection below it pays 2× per-row CPU —
    * exactly what `DeferExpensiveSortProject` exists to move above the
    * sort. Pinning this in the digest makes a dropped rule registration
    * fail the plan-golden gate (`defer=0` → `defer>0`) instead of
    * resurfacing rounds later as an unexplained 2× lake regression.
    * Walks through AQE wrappers (`AdaptiveSparkPlanExec.executedPlan`,
    * `QueryStageExec.plan` — query stages are leaf nodes, so a plain
    * tree fold would never see below a materialized shuffle).
    *
    * The double-executed region ENDS at the nearest lower exchange: the
    * bounds sampler re-runs only the RDD lineage feeding the range
    * exchange, and a lower shuffle's map outputs (and a broadcast's
    * materialized relation) are computed once and re-READ, not re-built.
    * So `belowRange` resets to false when the walk crosses any lower
    * non-range exchange boundary — without the reset the counter
    * over-counts projections that never execute twice (r15 advice:
    * ann_topk_int8's defer=4 included sub-shuffle projections). */
  def expensiveBelowRange(plan: SparkPlan): Int = {
    var count = 0
    def walk(node: SparkPlan, belowRange: Boolean): Unit = {
      node match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, belowRange)
        case q: QueryStageExec => walk(q.plan, belowRange)
        case ex: ShuffleExchangeLike
            if ex.outputPartitioning.isInstanceOf[RangePartitioning] =>
          ex.children.foreach(walk(_, belowRange = true))
        case ex: org.apache.spark.sql.execution.exchange.Exchange =>
          // lower shuffle/broadcast boundary: subtree executes once
          ex.children.foreach(walk(_, belowRange = false))
        case p: ProjectExec =>
          if (belowRange)
            count += p.projectList.count(
              graft.plans.DeferExpensiveSortProject.isExpensive)
          p.children.foreach(walk(_, belowRange))
        case other => other.children.foreach(walk(_, belowRange))
      }
    }
    walk(plan, belowRange = false)
    count
  }
}

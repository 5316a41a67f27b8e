package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfPushdownSpec extends SparkSpec {

  def frames() = {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("ts"))
    val hourly = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("event_type").as("et"), date_trunc("hour", col("ts")).as("h"))
      .agg(avg("value").as("av"))
    (ev, hourly)
  }

  test("left-only predicates push below the as-of join into the scan") {
    AsOfPushdown.register(spark)
    val (ev, hourly) = frames()
    val joined = AsOfJoin(spark, ev, hourly, Seq("event_type"), Seq("et"), "ts", "h")
      .filter(col("event_id") < 100)
    val physical = joined.queryExecution.executedPlan.toString
    // the filter must reach the left parquet scan as a pushed filter,
    // which can only happen if the rule moved it below AsOfJoinPlan
    assert(physical.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]"),
      physical)
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.startsWith("Filter"), optimized) // no residual filter on top
  }

  test("by-key predicates mirror to both sides; right/ts predicates stay above") {
    AsOfPushdown.register(spark)
    val (ev, hourly) = frames()
    val joined = AsOfJoin(spark, ev, hourly, Seq("event_type"), Seq("et"), "ts", "h")
      .filter(col("event_type") === "click" && col("av") > 0)
    val optimized = joined.queryExecution.optimizedPlan.toString
    // group filter pushed to BOTH children: the left attr AND the
    // mirrored right attr must each carry the predicate
    assert("event_type#\\d+ = click".r.findFirstIn(optimized).isDefined, optimized)
    assert("et#\\d+ = click".r.findFirstIn(optimized).isDefined, optimized)
    // right-column predicate must remain above the join
    assert(optimized.linesIterator.next().contains("av"), optimized)
    // results are unchanged by pushdown
    val expected = AsOfJoin(spark, ev.filter(col("event_type") === "click"), hourly,
      Seq("event_type"), Seq("et"), "ts", "h").filter(col("av") > 0).count()
    assert(joined.count() === expected)
  }

  test("GraftExtensions registers strategy, rule and functions") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(e)
    import org.apache.spark.sql.graftops.PlanApi
    assert(PlanApi.plannerStrategiesOf(e, spark).contains(AsOfJoin.AsOfStrategy))
    assert(PlanApi.optimizerRulesOf(e, spark).contains(AsOfPushdown))
  }
}

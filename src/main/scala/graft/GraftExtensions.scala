package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions
import graft.plans.{AsOfJoin, AsOfPushdown, DeferExpensiveSortProject, NanosRangePushdown, NtzCastPushdown, SmallSortSinglePartition}

/** spark-submit-time registration of the engine's Catalyst extensions:
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Installs the as-of join planner strategy + its pushdown rule, BOTH
  * timestamp-encoding pushdown rules (nanos-int64 truncation and the
  * foreign-session NTZ cast — so an extensions session prunes parquet
  * row groups on every events encoding without going through
  * [[graft.Tables]] first), and the native SQL functions. (Inside an
  * already-running session the equivalent calls are `AsOfJoin.register`,
  * `AsOfPushdown.register`, `NanosRangePushdown.register`,
  * `NtzCastPushdown.register` and `GraftFunctions.register`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoin.AsOfStrategy)
    e.injectOptimizerRule(_ => AsOfPushdown)
    e.injectOptimizerRule(_ => NanosRangePushdown)
    e.injectOptimizerRule(_ => NtzCastPushdown)
    // before DeferExpensiveSortProject — the ordering contract on
    // SmallSortSinglePartition's scaladoc (collapsed small sorts keep
    // expensive projections below the all-to-one exchange)
    e.injectOptimizerRule(_ => SmallSortSinglePartition)
    e.injectOptimizerRule(_ => DeferExpensiveSortProject)
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    GraftFunctions.registry.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}

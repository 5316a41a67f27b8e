package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{EwmaWindow, RollingHash, VectorCosine, VectorDot}
import graft.plans.{AsOfJoin, AsOfPushdown}

/** spark-submit-time registration of the engine's Catalyst extensions:
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Installs the as-of join planner strategy + its pushdown rule and the
  * native SQL functions. (Inside an already-running session the
  * equivalent calls are `AsOfJoin.register`, `AsOfPushdown.register` and
  * `GraftFunctions.register`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoin.AsOfStrategy)
    e.injectOptimizerRule(_ => AsOfPushdown)
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    e.injectFunction((FunctionIdentifier("ewma"),
      info("ewma", "ewma(value, alpha) OVER (...) — per-group EWMA window"),
      exprs => EwmaWindow(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) — 64-bit polynomial content hash"),
      exprs => RollingHash(exprs.head)))
    e.injectFunction((FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) — cosine of two numeric arrays"),
      exprs => VectorCosine(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) — dot product of two numeric arrays"),
      exprs => VectorDot(exprs(0), exprs(1))))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the engine's native Catalyst expressions.
  * After `register(spark)`:
  *   SELECT ewma(value, 0.05) OVER (PARTITION BY k ORDER BY ts) ...
  *   SELECT rolling_hash(text) ...
  * or from the Column API via `call_function("ewma", ...)`.
  *
  * [[registry]] is the single source for both in-session registration and
  * the spark-submit path ([[graft.GraftExtensions]]) — the two surfaces
  * cannot drift.
  */
object GraftFunctions {

  /** (name, usage, builder) for every native SQL function. */
  val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ewma", "ewma(value, alpha) OVER (...) — per-group EWMA window",
      exprs => EwmaWindow(exprs(0), exprs(1))),
    ("rolling_hash", "rolling_hash(text) — 64-bit polynomial content hash",
      exprs => RollingHash(exprs.head)),
    ("vector_cosine", "vector_cosine(a, b) — cosine of two numeric arrays",
      exprs => VectorCosine(exprs(0), exprs(1))),
    ("vector_dot", "vector_dot(a, b) — dot product of two numeric arrays",
      exprs => VectorDot(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registry.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

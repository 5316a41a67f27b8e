package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native Catalyst expressions.
  * After `register(spark)`:
  *   SELECT ewma(value, 0.05) OVER (PARTITION BY k ORDER BY ts) ...
  *   SELECT rolling_hash(text) ...
  * or from the Column API via `call_function("ewma", ...)`.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ewma",
      exprs => EwmaWindow(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("vector_cosine",
      exprs => VectorCosine(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_dot",
      exprs => VectorDot(exprs(0), exprs(1)), "built-in")
  }
}

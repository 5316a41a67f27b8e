package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exponentially-weighted moving average per group — the reference's one
  * truly sequential operator (`/root/reference/src/bin/crunch.rs:220-294`,
  * spec `calcs.md:52-63`).
  *
  * Semantics reproduced exactly:
  *  - state starts at 0.0 per group and resets when the group changes;
  *  - `ewma_t = (1-α)·state + α·value_t`, state advances to `ewma_t`;
  *  - a null value emits null and does NOT advance the state
  *    (`crunch.rs:251-267`).
  *
  * Scale design: `repartition(groupKey)` + `sortWithinPartitions` +
  * `mapPartitions` — one shuffle, then a single sequential pass per
  * partition with O(1) state. No driver collect, no window materialization.
  * Skewed/huge groups stay within one task by construction (a group must be
  * scanned in order); with few giant groups a chunked prefix-scan
  * formulation would apply, not needed at current group cardinalities.
  */
object Ewma {

  /** Append column `outCol` with the per-group EWMA of `valueCol`.
    * Output row order is not defined (as with any shuffle); order with
    * a downstream sort if needed.
    */
  def withEwma(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val enc = Encoders.row(outSchema)
    val sortCols: Seq[Column] = (groupCol +: orderCols).map(col)
    val gIdx = df.schema.fieldIndex(groupCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(groupCol))
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var state = 0.0
        it.map { r =>
          val k = r.get(gIdx)
          if (!started || k != curKey) { curKey = k; state = 0.0; started = true }
          val out: Any =
            if (r.isNullAt(vIdx)) null
            else {
              val v = r.getDouble(vIdx)
              state = (1.0 - alpha) * state + alpha * v
              state
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }(enc)
  }
}

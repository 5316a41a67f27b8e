package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series hole handling and behavioral sessionization — the two
  * window shapes the reference's dashboards stop short of (its gap-fill
  * is spine + interpolation, reference src/bin/crunch.rs:379-440; these
  * are the carry-forward and session-boundary variants every telemetry
  * pipeline also needs).
  *
  * Scale shape: one bounded window per key (device/user histories are
  * short relative to the corpus) — the same per-stratum posture as
  * [[TextAnalysis.tokenBudgetSelect]]; no global sort anywhere.
  */
object TimeSeries {

  /** Last-observation-carried-forward: replace null `valueCols` with the
    * most recent non-null value in the key's (orderCol, tieCol) history.
    * Leading nulls (no prior observation) stay null — compose with a
    * default via `coalesce` if a floor value exists. */
  def locf(df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Gap-based sessionization: a new session starts at the first event of
    * a key and whenever the gap from the previous event exceeds
    * `gapSeconds`. Adds `session_n` (1-based per key) — exact integer
    * arithmetic end-to-end (gap compare in µs, running sum of session
    * starts), so the assignment is engine-independent. Ties on the
    * timestamp break by `tieCol` to keep the numbering total. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    // session_n is an OUTPUT column and _ts_new_session internal scratch —
    // withColumn would silently overwrite same-named caller columns
    Guards.requireFreshColumns(df, "TimeSeries.sessionize",
      Seq("session_n", "_ts_new_session"))
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(wOrd)
    df.withColumn("_ts_new_session",
        when(prev.isNull ||
          unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_n", sum(col("_ts_new_session")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_ts_new_session")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators beyond the reference's operational
  * loops: watermarked windowed aggregation and a stateful streaming EWMA —
  * the streaming counterparts of the batch P17/A4 and W1 operators, built
  * on Structured Streaming so the same engine serves both modes.
  */
object EventStream {

  /** 5-minute windowed sum/count with a watermark for late data.
    * Input needs (ts: timestamp, event_type: string, value: double). */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
      window5: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window5).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on an id column with a watermark bounding the
    * dedup state (late duplicates beyond the watermark are not caught —
    * the standard trade; the batch `Dedup.exactDedup` is the unbounded
    * form). */
  def dedupStream(events: DataFrame, idCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  final case class Point(key: String, ts: java.sql.Timestamp, value: Double)
  final case class EwmaOut(key: String, ts: java.sql.Timestamp, ewma: Double)
  final case class EwmaState(ewma: Double)

  /** Streaming EWMA per key via flatMapGroupsWithState — the micro-batch
    * form of [[graft.operators.Ewma]]: state is one double per key.
    * Within a micro-batch, rows are folded in event-time order. */
  def streamingEwma(points: Dataset[Point], alpha: Double): Dataset[EwmaOut] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], state: GroupState[EwmaState]) =>
          var cur = state.getOption.map(_.ewma).getOrElse(0.0)
          val out = rows.toSeq.sortBy(_.ts.getTime).map { p =>
            cur = (1.0 - alpha) * cur + alpha * p.value
            EwmaOut(key, p.ts, cur)
          }
          state.update(EwmaState(cur))
          out.iterator
      }
  }
}

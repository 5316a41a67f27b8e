package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The segment-composed EWMA ([[Ewma.withEwmaSegmented]]) vs the
  * sequential operator it parallelizes. The sequential form's
  * parallelism is capped at the GROUP count (SURVEY §7.4: 5 NEM regions
  * ⇒ 5 tasks); the segmented form folds every (group, chunk)
  * independently and composes entry states through a chunk-bounded
  * prefix pass. Exactness contract (see the operator doc): bitwise
  * identity whenever IEEE arithmetic is exact and for all first-chunk
  * rows; ≤ ulps elsewhere, with the op order itself pinned by the
  * `w01c_ewma_segmented` DuckDB oracle. */
class EwmaSegmentedSpec extends SparkSpec {

  private def ts(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  // chunk = event_id div 3: monotone in (ts, event_id) because ts grows
  // with event_id in every fixture here — forced multi-chunk at 3 rows
  private val chunk3 = expr("event_id div 3")

  test("dyadic fixture (alpha = 0.5, exact IEEE): bitwise-identical to the sequential operator") {
    import spark.implicits._
    // 2 groups × 10 rows with interleaved nulls: exercises group reset,
    // null passthrough (state must NOT advance), and 4 chunks per group.
    // All values are small integers and alpha is a power of two, so every
    // multiply/add in BOTH evaluation orders is exact — the composed
    // result must match the sequential one bit for bit.
    val rows = for {
      u <- Seq(1L, 2L); i <- 0L until 10L
    } yield (u, ts(1000 + i), i,
      if (i % 4 == 3) None else Some((u * 7 + i * 3 % 5 + 1).toDouble))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def run(f: => org.apache.spark.sql.DataFrame): Map[(Long, Long), Option[Long]] =
      f.select(col("user_id"), col("event_id"), col("ewma"))
        .collect().map { r =>
          (r.getLong(0), r.getLong(1)) ->
            (if (r.isNullAt(2)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
        }.toMap
    val seq = run(Ewma.withEwma(df, "user_id", Seq("ts", "event_id"), "value", 0.5, "ewma"))
    val seg = run(Ewma.withEwmaSegmented(df, "user_id", Seq("ts", "event_id"),
      "value", 0.5, "ewma", chunk3))
    assert(seg === seq)
  }

  test("general alpha: null mask identical, first chunk bitwise, later chunks within 1e-12 relative") {
    import spark.implicits._
    val rows = for {
      u <- Seq(1L, 2L, 3L); i <- 0L until 24L
    } yield (u, ts(2000 + i), i,
      if ((u + i) % 7 == 6) None else Some(math.sin(u * 31 + i) * 100.0 + 0.1))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def run(f: => org.apache.spark.sql.DataFrame): Seq[(Long, Long, Option[Double])] =
      f.select(col("user_id"), col("event_id"), col("ewma"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    val seq = run(Ewma.withEwma(df, "user_id", Seq("ts", "event_id"), "value", 0.05, "ewma"))
    val seg = run(Ewma.withEwmaSegmented(df, "user_id", Seq("ts", "event_id"),
      "value", 0.05, "ewma", chunk3))
    assert(seq.map(t => (t._1, t._2, t._3.isEmpty)) === seg.map(t => (t._1, t._2, t._3.isEmpty)))
    seq.zip(seg).foreach { case ((u, e, a), (_, _, b)) =>
      (a, b) match {
        case (Some(x), Some(y)) =>
          if (e < 3) // first chunk: entry state 0 short-circuits to the local fold
            assert(java.lang.Double.doubleToRawLongBits(x) ===
              java.lang.Double.doubleToRawLongBits(y), s"first-chunk row ($u,$e)")
          else
            assert(math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(x)),
              s"row ($u,$e): seq=$x seg=$y")
        case (None, None) => ()
        case other => fail(s"null mask mismatch at ($u,$e): $other")
      }
    }
  }

  test("single-chunk degenerate and shuffle-entries fallback are bitwise-identical to sequential") {
    import spark.implicits._
    val rows = (0L until 9L).map(i =>
      (1L, ts(3000 + i), i, if (i == 4) None else Some(i * 1.37 + 0.2)))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def bits(f: => org.apache.spark.sql.DataFrame): Seq[(Long, Option[Long])] =
      f.select(col("event_id"), col("ewma")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))))
        .sortBy(_._1).toSeq
    val seq = bits(Ewma.withEwma(df, "user_id", Seq("ts", "event_id"), "value", 0.05, "ewma"))
    // one chunk for the whole group → S = 0 for every row → exact
    val one = bits(Ewma.withEwmaSegmented(df, "user_id", Seq("ts", "event_id"),
      "value", 0.05, "ewma", lit(0L)))
    assert(one === seq)
    // huge-cardinality knob: entries join degrades to a shuffle, results identical
    val shuf = bits(Ewma.withEwmaSegmented(df, "user_id", Seq("ts", "event_id"),
      "value", 0.05, "ewma", lit(0L), broadcastEntries = false))
    assert(shuf === seq)
  }
}

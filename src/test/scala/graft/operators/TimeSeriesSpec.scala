package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("locf: nulls take the last prior observation; leading nulls stay null") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, t("2024-01-01T00:00:00Z"), Option.empty[Double]), // leading null
      ("a", 2L, t("2024-01-01T00:01:00Z"), Some(10.0)),
      ("a", 3L, t("2024-01-01T00:02:00Z"), Option.empty[Double]), // → 10.0
      ("a", 4L, t("2024-01-01T00:03:00Z"), Some(20.0)),
      ("b", 5L, t("2024-01-01T00:00:30Z"), Option.empty[Double])  // other key untouched
    ).toDF("k", "id", "ts", "v")
    val out = TimeSeries.locf(df, "k", "ts", "id", Seq("v"))
      .collect().map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(10.0))
    assert(out(3L) === Some(10.0))
    assert(out(4L) === Some(20.0))
    assert(out(5L) === None)
  }

  test("sessionize: gap > threshold starts a new session; numbering is per key") {
    import spark.implicits._
    val df = Seq(
      (7L, 1L, t("2024-01-01T00:00:00Z")),
      (7L, 2L, t("2024-01-01T00:10:00Z")), // 10 min → same session
      (7L, 3L, t("2024-01-01T01:00:00Z")), // 50 min → new session
      (7L, 4L, t("2024-01-01T01:01:00Z")),
      (8L, 5L, t("2024-01-01T05:00:00Z"))  // other user starts at 1
    ).toDF("user_id", "event_id", "ts")
    val out = TimeSeries.sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_n")).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("streaming sessionize matches the batch operator on in-order input") {
    import spark.implicits._
    val rows = Seq(
      // 999 µs past the 1800 s threshold: a new session at full µs
      // precision, but ms truncation reads the gap as exactly 1800 s and
      // would keep one session — pins the streaming micros() arithmetic
      graft.streaming.EventStream.Ev(7L, 1L, t("2024-01-01T00:00:00Z")),
      graft.streaming.EventStream.Ev(7L, 2L, t("2024-01-01T00:30:00.000999Z")),
      graft.streaming.EventStream.Ev(7L, 3L, t("2024-01-01T02:00:00Z")),
      graft.streaming.EventStream.Ev(8L, 4L, t("2024-01-01T02:00:00Z")))
    val batch = TimeSeries.sessionize(
        rows.toDF().select(col("user_id"), col("event_id"), col("ts")),
        "user_id", "ts", "event_id", gapSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_n")).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.EventStream.Ev]
    val q = graft.streaming.EventStream.streamingSessionize(mem.toDS(), 1800L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    mem.addData(rows.take(2): _*)   // batch 1
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*)   // batch 2: state must carry across
    q.processAllAvailable()
    val streamed = spark.sql("SELECT event_id, session_n FROM sess")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(streamed === batch)
  }
}

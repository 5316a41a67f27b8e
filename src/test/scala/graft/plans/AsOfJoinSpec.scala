package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("as-of semantics: latest right ≤ left ts per key; no match → null; ties match") {
    import spark.implicits._
    val l = Seq(("a", ts("2024-01-01T00:00:05Z"), 1),
      ("a", ts("2024-01-01T00:00:10Z"), 2),
      ("b", ts("2024-01-01T00:00:03Z"), 3),
      ("a", ts("2024-01-01T00:00:04Z"), 4) // exact tie with right @4
    ).toDF("k", "lts", "lid")
    val r = Seq(("a", ts("2024-01-01T00:00:04Z"), 100.0),
      ("a", ts("2024-01-01T00:00:09Z"), 200.0),
      ("c", ts("2024-01-01T00:00:01Z"), 300.0)
    ).toDF("rk", "rts", "v")
    val out = AsOfJoin(spark, l, r, Seq("k"), Seq("rk"), "lts", "rts")
      .select("lid", "v").orderBy("lid")
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getDouble(1)))
    assert(out.toSeq === Seq((1, 100.0), (2, 200.0), (3, null), (4, 100.0)))
  }

  test("null by-keys never match (SQL equi-join / DuckDB ASOF semantics)") {
    import spark.implicits._
    val l = Seq((Option("a"), ts("2024-01-01T00:00:05Z"), 1),
      (Option.empty[String], ts("2024-01-01T00:00:05Z"), 2),
      (Option("b"), ts("2024-01-01T00:00:05Z"), 3)
    ).toDF("k", "lts", "lid")
    val r = Seq((Option("a"), ts("2024-01-01T00:00:01Z"), 100.0),
      (Option.empty[String], ts("2024-01-01T00:00:01Z"), 999.0) // must never pair with null left
    ).toDF("rk", "rts", "v")
    val out = AsOfJoin(spark, l, r, Seq("k"), Seq("rk"), "lts", "rts")
      .select("lid", "v").orderBy("lid")
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getDouble(1)))
    assert(out.toSeq === Seq((1, 100.0), (2, null), (3, null)))
  }

  test("physical plan: AsOfJoinExec with co-partitioned sorted children") {
    import spark.implicits._
    val l = (1 to 100).map(i => (s"k${i % 7}", ts(f"2024-01-01T00:${i % 60}%02d:00Z"), i))
      .toDF("k", "lts", "lid").repartition(5)
    val r = (1 to 50).map(i => (s"k${i % 7}", ts(f"2024-01-01T00:${i % 60}%02d:00Z"), i * 1.0))
      .toDF("rk", "rts", "v").repartition(3)
    val joined = AsOfJoin(spark, l, r, Seq("k"), Seq("rk"), "lts", "rts")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan) // Exec nodes render without the suffix
    assert(plan.contains("Exchange hashpartitioning(k"), plan) // EnsureRequirements shuffled
    assert(plan.contains("Sort [k"), plan)
    assert(joined.count() === 100)
  }

  test("agrees with an independent window-function formulation on real data") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("ts"))
    val hourly = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("event_type").as("et"), date_trunc("hour", col("ts")).as("h"))
      .agg(avg("value").as("av"))
    val viaAsOf = AsOfJoin(spark, ev, hourly, Seq("event_type"), Seq("et"), "ts", "h")
      .select(col("event_id"), col("av"))
    // reference: join all h ≤ ts then keep the latest per event
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_id").orderBy(col("h").desc)
    val viaWindow = ev.join(hourly, col("event_type") === col("et") && col("h") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("av").as("av_ref"))
    val diff = viaAsOf.join(viaWindow, "event_id")
      .filter(col("av") =!= col("av_ref") || (col("av").isNull !== col("av_ref").isNull))
    assert(diff.count() === 0)
    assert(viaAsOf.count() === ev.count())
  }
}

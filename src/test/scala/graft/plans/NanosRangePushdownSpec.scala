package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NanosRangePushdownSpec extends SparkSpec {

  private def nanosTable() = {
    import spark.implicits._
    val dir = tmpDir("nanos") + "/t"
    // raw int64 nanos spanning 2024-01-01T00:00:00Z .. +10s
    (0L until 10000L).map(i => (i, 1704067200000000000L + i * 1000000L))
      .toDF("id", "ts").write.parquet(dir)
    spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  test("range predicate on the truncated column reaches PushedFilters as raw nanos") {
    NanosRangePushdown.register(spark)
    val lo = "2024-01-01 00:00:02"
    val hi = "2024-01-01 00:00:04"
    val q = nanosTable().filter(
      col("ts") >= lit(lo).cast("timestamp") && col("ts") <= lit(hi).cast("timestamp"))
    val scan = q.queryExecution.executedPlan.toString
    // lo µs = 1704067202000000 → nanos bound 1704067202000000000
    assert(scan.contains("GreaterThanOrEqual(ts,1704067202000000000)"), s"no pushed lower bound in:\n$scan")
    assert(scan.contains("LessThanOrEqual(ts,1704067204000000999)"), s"no pushed upper bound in:\n$scan")
    // and the result is unchanged vs. evaluating without the derived bounds
    assert(q.count() === 2001)
  }

  test("truncation boundary: derived bounds keep rows whose nanos truncate into range") {
    NanosRangePushdown.register(spark)
    import spark.implicits._
    val dir = tmpDir("nanos_edge") + "/t"
    // 999 ns above an exact second: truncates DOWN into the upper bound
    Seq((1L, 1704067204000000999L), (2L, 1704067204000001000L))
      .toDF("id", "ts").write.parquet(dir)
    val df = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val kept = df.filter(col("ts") <= lit("2024-01-01 00:00:04").cast("timestamp"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L)) // row 2 is 1 µs past the bound
  }

  test("no derivation under OR; equality derives a closed nanos interval") {
    NanosRangePushdown.register(spark)
    val tEq = lit("2024-01-01 00:00:02").cast("timestamp")
    val eqPlan = nanosTable().filter(col("ts") === tEq)
      .queryExecution.executedPlan.toString
    assert(eqPlan.contains("GreaterThanOrEqual(ts,1704067202000000000)"), eqPlan)
    assert(eqPlan.contains("LessThanOrEqual(ts,1704067202000000999)"), eqPlan)
    // convergence: the bound appears once per plan section (Filter,
    // DataFilters, PushedFilters), not once per optimizer iteration —
    // an And-wrapped derivation used to re-add it 100 times
    val occurrences = "1704067202000000000".r.findAllIn(eqPlan).length
    assert(occurrences <= 3, s"derived bound duplicated $occurrences times:\n$eqPlan")
    val orPlan = nanosTable().filter(col("ts") === tEq || col("id") === 1L)
      .queryExecution.executedPlan.toString
    assert(!orPlan.contains("1704067202000000000"), s"derived bound leaked under OR:\n$orPlan")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Canonical loader for the driver-generated test tables.
  *
  * All queries go through here so schema quirks are fixed in one place:
  * `events.ts` is parquet TIMESTAMP(NANOS); with
  * `spark.sql.legacy.parquet.nanosAsLong=true` Spark surfaces it as a
  * raw Long which we floor-truncate to microseconds (matching what any
  * µs-precision consumer of the same file sees).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType) {
      // range predicates on the truncated column can't reach the scan on
      // their own — the pushdown rule derives the raw-nanos bounds
      graft.plans.NanosRangePushdown.register(spark)
      // integer div, not `/`: long→double division loses ulps at 1e18 ns
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
  }
}

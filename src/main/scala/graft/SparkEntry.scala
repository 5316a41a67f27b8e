package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline dashboard shape: 5-minute time-bucket
    * aggregation over the event stream (SURVEY.md §7.2,
    * reference grafana/dashboards/all.json panel 1). */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    ev.groupBy(timestamp_micros((unix_micros(col("ts")) / 300000000L).cast("long") * 300000000L)
        .as("bucket"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .orderBy("bucket")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}

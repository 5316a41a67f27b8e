package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The interactive SQL surface (reference §3.3: Grafana panels → DuckDB
  * SQL over the parquet lake). Tables register as temp views; panels run
  * as `spark.sql` — demonstrating that the engine's SQL dialect covers the
  * dashboard corpus: time buckets, filtered aggregates (pivot), scalar
  * subquery ratios, and the `LIMIT 5000` timeline guardrail
  * (grafana/dashboards/all.json, files.json, fpp.json).
  */
object SqlSurface {

  /** Register test tables as `<name>_v` temp views. Panels pass only the
    * tables they read — registering a view costs a parquet footer/schema
    * read per table, which at 4 panels × 10 tables was pure overhead. */
  def register(spark: SparkSession, dir: String,
      tables: Seq[String] = Tables.all): Unit =
    tables.foreach(t => Tables(spark, dir, t).createOrReplaceTempView(s"${t}_v"))

  /** all.json panel 1: 5-min bucket average within a time range. */
  def timeseriesPanel(spark: SparkSession, dir: String): DataFrame = {
    register(spark, dir, Seq("events"))
    spark.sql("""
      SELECT timestamp_micros(CAST(unix_micros(ts) DIV 300000000 AS BIGINT) * 300000000) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
      FROM events_v
      WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-10 00:00:00'
      GROUP BY 1 ORDER BY bucket""")
  }

  /** files.json thread-pivot shape: `agg FILTER (WHERE ...)` per lane. */
  def pivotPanel(spark: SparkSession, dir: String): DataFrame = {
    register(spark, dir, Seq("events"))
    spark.sql("""
      SELECT date_trunc('day', ts) AS day,
             max(event_id) FILTER (WHERE user_id % 4 = 0) AS lane_0,
             max(event_id) FILTER (WHERE user_id % 4 = 1) AS lane_1,
             max(event_id) FILTER (WHERE user_id % 4 = 2) AS lane_2,
             max(event_id) FILTER (WHERE user_id % 4 = 3) AS lane_3
      FROM events_v GROUP BY 1 ORDER BY day""")
  }

  /** files.json "Percent Processed": ratio of two scalar subqueries. */
  def percentPanel(spark: SparkSession, dir: String): DataFrame = {
    register(spark, dir, Seq("events"))
    spark.sql("""
      SELECT (SELECT count(*) FROM events_v WHERE event_type = 'purchase') AS n_done,
             (SELECT count(*) FROM events_v) AS n_all,
             CAST((SELECT count(*) FROM events_v WHERE event_type = 'purchase') AS DOUBLE)
               / CAST((SELECT count(*) FROM events_v) AS DOUBLE) AS frac""")
  }

  /** files.json timeline guardrail: newest-N window (LIMIT 5000 shape). */
  def timelinePanel(spark: SparkSession, dir: String): DataFrame = {
    register(spark, dir, Seq("events"))
    spark.sql("""
      SELECT event_id, user_id, event_type
      FROM events_v
      ORDER BY ts DESC, event_id DESC
      LIMIT 5000""")
  }
}

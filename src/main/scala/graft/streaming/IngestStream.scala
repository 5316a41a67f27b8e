package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.{HistoryTable, NemCsv}

/** Operational streaming (reference §2.8): the scrape→download→process
  * daemon loop (/root/reference/src/main.rs:39-74) re-expressed as
  * Structured Streaming over a landing directory.
  *
  * Files dropped into `landingDir` are discovered by the file source
  * (which replaces the reference's mpsc channels + worker pools — Spark's
  * scheduler provides the parallelism), each micro-batch is filtered
  * against the `processed` history (idempotent re-processing skip,
  * main.rs:248-250) and split into the parquet lake. `AvailableNow`
  * drains the backlog and stops — the 60 s daemon cadence is
  * `Trigger.ProcessingTime("60 seconds")` in production.
  */
object IngestStream {

  def start(spark: SparkSession, landingDir: String, lakeRoot: String,
      historyRoot: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val history = HistoryTable.processed(spark, historyRoot)
    val files = spark.readStream
      .format("binaryFile")
      // streaming sources need an explicit schema; this is binaryFile's
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.{csv,CSV,zip,ZIP}")
      .load(landingDir)
      .select(col("path"), col("length"))
    files.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fresh = history.filterNew(batch, "path")
          .select("path", "length").collect()
        if (fresh.nonEmpty) {
          val paths = fresh.map(_.getString(0)).toIndexedSeq
          NemCsv.splitToLake(spark, paths, lakeRoot)
          val now = new java.sql.Timestamp(System.currentTimeMillis())
          import spark.implicits._
          history.add(
            fresh.toIndexedSeq.map(r => (r.getString(0), r.getLong(1)))
              .toDF("filename", "size_bytes")
              .withColumn("processed_at", lit(now))
              .withColumn("batch_id", lit(batchId)))
        }
        ()
      }
      .start()
  }
}

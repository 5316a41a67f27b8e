package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.multimodal.Multimodal

/** Streaming MULTIMODAL ingest — the media sibling of [[IngestStream]]:
  * raw image/audio/video files dropped into a landing directory are
  * discovered by the `binaryFile` streaming source, header-sniffed by
  * [[Multimodal.routeModality]] (no pixel/sample decode on the ingest
  * path), and appended to a modality-partitioned parquet lake with
  * their per-modality metadata and content digest. Downstream decode
  * kernels ([[graft.multimodal.Audio.audioFeatures]],
  * [[graft.multimodal.Video.videoFrameFeatures]],
  * `Multimodal.imageFeatures`) then read ONLY their own partition —
  * `modality=image/` etc. prunes at the directory level, the 100 TB
  * posture for mixed media.
  *
  * Exactly-once: the file source's checkpoint tracks seen files, so a
  * restart re-lists but never re-processes — no history table needed
  * (unlike the CSV path, whose landing files are re-downloadable by
  * name and want an engine-visible audit row). `AvailableNow` drains
  * the backlog and stops; production cadence is a ProcessingTime
  * trigger, same contract as the reference's daemon loop. */
object MediaStream {

  /** Media containers the JDK SPIs can sniff; everything else still
    * lands (routed `unknown`) so nothing is silently dropped. */
  val DefaultGlob = "*.{png,PNG,jpg,jpeg,bmp,gif,GIF,tif,tiff,wav,WAV,aiff,au}"

  def start(spark: SparkSession, landingDir: String, lakeDir: String,
      checkpoint: String, glob: String = DefaultGlob,
      maxBytes: Long = 256L * 1024 * 1024,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .format("binaryFile")
      // streaming sources need an explicit schema; this is binaryFile's
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", glob)
      .load(landingDir)
      .filter(col("length") <= maxBytes)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Multimodal.routeModality(batch, "content")
          .withColumn("digest", md5(col("content")))
          .select("path", "length", "modality", "width", "height",
            "n_frames", "sample_rate", "n_samples", "digest")
          .write.mode("append").partitionBy("modality").parquet(lakeDir)
        ()
      }
      .start()

  /** The routed lake back as a DataFrame — partition column `modality`
    * restored by the reader; filters on it prune directories. */
  def readLake(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.parquet(lakeDir)
}

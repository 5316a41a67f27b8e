package graft.streaming

import graft.SparkSpec
import graft.multimodal.{Audio, Multimodal, Video}
import org.apache.spark.sql.functions._

class MediaStreamSpec extends SparkSpec {

  private def one(seed: Long) = {
    import spark.implicits._
    Seq(Tuple1(seed)).toDF("doc_id")
  }
  private def payload(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.select("payload").head().getAs[Array[Byte]](0)

  test("media landing dir streams into a modality-partitioned lake; restart never re-processes") {
    val base = java.nio.file.Files.createTempDirectory("graft_media_stream")
    val landing = base.resolve("landing"); val lake = s"$base/lake"
    val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(landing)
    try {
      java.nio.file.Files.write(landing.resolve("a.png"),
        payload(Multimodal.synthesizePngPattern(one(1L), "doc_id", 4, 4)))
      java.nio.file.Files.write(landing.resolve("b.wav"),
        payload(Audio.synthesizeWavPattern(one(2L), "doc_id", nSamples = 32)))
      java.nio.file.Files.write(landing.resolve("c.gif"),
        payload(Video.synthesizeGifPattern(one(3L), "doc_id", 2, 2, nFrames = 3)))

      MediaStream.start(spark, landing.toString, lake, ckpt).awaitTermination()
      val t1 = MediaStream.readLake(spark, lake)
      assert(t1.count() === 3)
      val byMod = t1.collect().map(r => r.getAs[String]("modality") ->
        r.getAs[String]("path")).toMap
      assert(byMod.keySet === Set("image", "audio", "video"))
      assert(byMod("audio").endsWith("b.wav"))
      // per-modality metadata landed typed
      val wav = t1.filter(col("modality") === "audio").head()
      assert((wav.getAs[Int]("sample_rate"), wav.getAs[Long]("n_samples")) === ((8000, 32L)))
      val gif = t1.filter(col("modality") === "video").head()
      assert(gif.getAs[Int]("n_frames") === 3)
      // the lake is DIRECTORY-partitioned by modality (downstream decode
      // kernels scan only their own branch)
      assert(java.nio.file.Files.exists(java.nio.file.Path.of(lake, "modality=image")))
      assert(java.nio.file.Files.exists(java.nio.file.Path.of(lake, "modality=audio")))

      // drop one NEW file and restart from the same checkpoint: the file
      // source's log must skip the three already-ingested files
      java.nio.file.Files.write(landing.resolve("d.wav"),
        payload(Audio.synthesizeWavPattern(one(9L), "doc_id", nSamples = 16)))
      MediaStream.start(spark, landing.toString, lake, ckpt).awaitTermination()
      val t2 = MediaStream.readLake(spark, lake)
      assert(t2.count() === 4)
      assert(t2.filter(col("path").endsWith("b.wav")).count() === 1) // no dup
      // digest of the new file matches an independent md5 of its bytes
      val dBytes = java.nio.file.Files.readAllBytes(landing.resolve("d.wav"))
      val md = java.security.MessageDigest.getInstance("MD5").digest(dBytes)
        .map("%02x".format(_)).mkString
      assert(t2.filter(col("path").endsWith("d.wav")).head().getAs[String]("digest") === md)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("ingestBatch is exactly-once: committed replays no-op, a crash before the marker rolls back") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_media_commit")
    val lake = s"$base/lake"
    try {
      val batch = Seq(
        ("f1.png", payload(Multimodal.synthesizePngPattern(one(1L), "doc_id", 2, 2))),
        ("f2.wav", payload(Audio.synthesizeWavPattern(one(2L), "doc_id", nSamples = 8))))
        .toDF("path", "content").withColumn("length", length(col("content")).cast("long"))

      assert(MediaStream.ingestBatch(batch, lake, 7L) === 2L)
      assert(MediaStream.readLake(spark, lake).count() === 2)

      // committed replay (restart re-delivers the same batchId): no-op
      assert(MediaStream.ingestBatch(batch, lake, 7L) === 0L)
      assert(MediaStream.readLake(spark, lake).count() === 2)

      // crash BETWEEN publish and marker: the marker is missing but the
      // batch's files are in the lake — the replay must roll them back
      // before republishing, or every crash would duplicate the batch
      val marker = java.nio.file.Path.of(lake, "_graft_commits", "batch-7")
      java.nio.file.Files.delete(marker)
      assert(MediaStream.ingestBatch(batch, lake, 7L) === 2L)
      assert(MediaStream.readLake(spark, lake).count() === 2) // not 4
      assert(java.nio.file.Files.exists(marker))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

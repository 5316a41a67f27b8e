package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec audio (javax.sound.sampled) and multi-frame video
  * (javax.imageio animated GIF) kernels: encode → decode roundtrips
  * must be BIT-exact against the documented integer formulas — that
  * exactness is what makes mm_audio_pipeline / mm_video_frames
  * oracle-checkable. */
class AudioVideoSpec extends SparkSpec {

  private def sample(seed: Long, i: Int): Int =
    java.lang.Math.floorMod(seed * 7919L + i.toLong * 104729L, 65536L).toInt - 32768

  private def ids(vs: Long*) = {
    import spark.implicits._
    vs.map(Tuple1(_)).toDF("doc_id")
  }

  test("WAV roundtrip: synthesized payload is a real RIFF/WAVE the JDK reads back sample-exactly") {
    val out = Audio.synthesizeWavPattern(ids(0L, 7L, 300L), "doc_id", nSamples = 64, sampleRate = 8000)
      .select("doc_id", "payload").orderBy("doc_id").collect()
    out.foreach { r =>
      val seed = r.getLong(0); val bytes = r.getAs[Array[Byte]](1)
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
      val Some(meta) = Audio.JdkAudioCodec.decodeMeta(bytes)
      assert(meta === Audio.AudioMeta(Some(8000), 1, 16, Some(64L)))
      val Some(samples) = Audio.JdkAudioCodec.pcmSamples(bytes)
      assert(samples.length === 64)
      samples.zipWithIndex.foreach { case (s, i) =>
        assert(s === sample(seed, i), s"seed $seed sample $i")
      }
    }
  }

  test("audio codec: non-audio payloads and images are None; audioFeatures routes them to nulls") {
    val png = {
      val img = new java.awt.image.BufferedImage(3, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    assert(Audio.JdkAudioCodec.decodeMeta("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Audio.JdkAudioCodec.decodeMeta(png).isEmpty)
    assert(Audio.JdkAudioCodec.pcmSamples(png).isEmpty)

    import spark.implicits._
    val rows = Seq((1L, png), (2L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val feats = Audio.audioFeatures(rows, "payload", frameLen = 16)
      .select("doc_id", "sample_rate", "n_samples", "frame_energy").orderBy("doc_id").collect()
    assert(feats.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
  }

  test("audioFeatures: frame energies are the exact Σ|sample| integers, ragged tail frame included") {
    // 40 samples at frameLen 16 → frames of 16, 16, 8
    val feats = Audio.audioFeatures(
      Audio.synthesizeWavPattern(ids(5L), "doc_id", nSamples = 40, sampleRate = 16000),
      "payload", frameLen = 16)
      .select("sample_rate", "n_channels", "n_samples", "frame_energy").head()
    assert(feats.getInt(0) === 16000)
    assert(feats.getInt(1) === 1)
    assert(feats.getLong(2) === 40L)
    val energy = feats.getSeq[Long](3)
    val want = (0 until 40).map(i => (i / 16, math.abs(sample(5L, i)).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(energy === Seq(want(0), want(1), want(2)))
  }

  private def gifValue(seed: Long, x: Int, y: Int, f: Int): Int =
    java.lang.Math.floorMod(seed + 83L * x + 47L * y + 131L * f, 256L).toInt

  test("GIF roundtrip: synthesized animated GIF decodes frame-by-frame to the exact gray formula") {
    val out = Video.synthesizeGifPattern(ids(0L, 9L, 260L), "doc_id", 4, 3, nFrames = 3)
      .select("doc_id", "payload").orderBy("doc_id").collect()
    out.foreach { r =>
      val seed = r.getLong(0); val bytes = r.getAs[Array[Byte]](1)
      assert(new String(bytes.take(3), "US-ASCII") === "GIF")
      // the single-frame image path sees the same container: 3 frames
      assert(Multimodal.JdkImageCodec.decodeDims(bytes) === Some((4, 3, 3)))
      val Some(frames) = Video.JdkVideoCodec.frameLumaGrids(bytes, grid = 1)
      assert(frames.length === 3)
      // grid=1 over a 4×3 frame = mean luma of all 12 gray pixels; each
      // pixel's luma is v·(0.299+0.587+0.114)/255 with the documented
      // IEEE chain — recompute it identically here
      frames.zipWithIndex.foreach { case (g, f) =>
        var sum = 0.0; var n = 0
        (0 until 3).foreach { y => (0 until 4).foreach { x =>
          val v = gifValue(seed, x, y, f)
          sum += (0.299 * v + 0.587 * v + 0.114 * v) / 255.0; n += 1
        } }
        assert(java.lang.Double.doubleToRawLongBits(g(0)) ===
          java.lang.Double.doubleToRawLongBits(sum / n), s"seed $seed frame $f")
      }
    }
  }

  test("videoFrameFeatures: one row per frame with exact per-pixel luma at grid=frame size; non-video emits nothing") {
    import spark.implicits._
    val rows = Video.synthesizeGifPattern(ids(3L), "doc_id", 2, 2, nFrames = 4)
      .union(Seq((99L, "not a container".getBytes("UTF-8"))).toDF("doc_id", "payload"))
    val frames = Video.videoFrameFeatures(rows, "payload", grid = 2)
      .select("doc_id", "frame_idx", "frame_features").orderBy("doc_id", "frame_idx").collect()
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      (0 until 4).map(f => (3L, f)))
    frames.foreach { r =>
      val f = r.getInt(1); val feats = r.getSeq[Double](2)
      val want = Seq((0, 0), (1, 0), (0, 1), (1, 1)).map { case (x, y) =>
        val v = gifValue(3L, x, y, f)
        (0.299 * v + 0.587 * v + 0.114 * v) / 255.0
      }
      assert(feats.map(java.lang.Double.doubleToRawLongBits) ===
        want.map(java.lang.Double.doubleToRawLongBits), s"frame $f")
    }
  }

  test("routeModality: header-only sniff dispatches image/video/audio/unknown with per-modality meta") {
    import spark.implicits._
    val png = Multimodal.synthesizePngPattern(ids(10L), "doc_id", 5, 7)
    val wav = Audio.synthesizeWavPattern(ids(11L), "doc_id", nSamples = 48, sampleRate = 16000)
    val gif = Video.synthesizeGifPattern(ids(12L), "doc_id", 3, 2, nFrames = 4)
    val unk = Seq((13L, "RAW0 garbage".getBytes("UTF-8")),
      (14L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = Multimodal.routeModality(
        png.unionByName(wav).unionByName(gif).unionByName(unk), "payload")
      .select("doc_id", "modality", "width", "height", "n_frames", "sample_rate", "n_samples")
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ===
      Seq("image", "audio", "video", "unknown", "unknown"))
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getInt(4)) === ((5, 7, 1)))
    assert(out(0).isNullAt(5) && out(0).isNullAt(6))
    assert((out(1).getInt(5), out(1).getLong(6)) === ((16000, 48L)))
    assert(out(1).isNullAt(2) && out(1).isNullAt(4))
    assert((out(2).getInt(2), out(2).getInt(3), out(2).getInt(4)) === ((3, 2, 4)))
    assert(out(3).isNullAt(2) && out(3).isNullAt(5))
  }

  test("routeModality: zero-led garbage is NOT misrouted image by the permissive WBMP sniffer") {
    import spark.implicits._
    // the JDK WBMP reader's canDecodeInput accepts any stream starting
    // 0x00 0x00 and reports garbage dims (here it would say 40×30)
    val zeroLed = Array[Byte](0, 0, 40, 30) ++ Array.fill[Byte](60)(7)
    assert(Multimodal.JdkImageCodec.decodeDims(zeroLed).isDefined,   // documented default
      "probe payload should trip the WBMP sniffer when allowed")
    assert(Multimodal.JdkImageCodec.decodeDims(zeroLed, allowWbmp = false).isEmpty)
    val out = Multimodal.routeModality(
        Seq((1L, zeroLed)).toDF("doc_id", "payload"), "payload")
      .select("modality", "width").head()
    assert(out.getString(0) === "unknown")
    assert(out.isNullAt(1))
  }

  test("audio meta: AU header with unknown data size yields null n_samples, not -1") {
    import spark.implicits._
    // AU header: ".snd", dataOffset=24, dataSize=0xFFFFFFFF (unknown),
    // encoding=3 (16-bit linear PCM), rate=8000, channels=1 — the JDK
    // reports frameLength = NOT_SPECIFIED (-1) for this container
    val b = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(b)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(0xFFFFFFFF)
    d.writeInt(3); d.writeInt(8000); d.writeInt(1)
    (0 until 32).foreach(i => d.writeShort(i * 100))
    val au = b.toByteArray
    assert(Audio.JdkAudioCodec.decodeMeta(au) ===
      Some(Audio.AudioMeta(Some(8000), 1, 16, None)))
    val out = Multimodal.routeModality(Seq((1L, au)).toDF("doc_id", "payload"), "payload")
      .select("modality", "sample_rate", "n_samples").head()
    assert(out.getString(0) === "audio")
    assert(out.getInt(1) === 8000)
    assert(out.isNullAt(2), "NOT_SPECIFIED frame length must land as null, not -1")
  }

  test("readBinaryDir: binaryFile ingest of real files on disk routes through the same codecs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin_ingest")
    try {
      // write one real file per modality through the SAME synthesis paths
      def payload(df: org.apache.spark.sql.DataFrame): Array[Byte] =
        df.select("payload").head().getAs[Array[Byte]](0)
      java.nio.file.Files.write(dir.resolve("a.png"),
        payload(Multimodal.synthesizePngPattern(ids(1L), "doc_id", 3, 3)))
      java.nio.file.Files.write(dir.resolve("b.wav"),
        payload(Audio.synthesizeWavPattern(ids(2L), "doc_id", nSamples = 16)))
      java.nio.file.Files.write(dir.resolve("c.gif"),
        payload(Video.synthesizeGifPattern(ids(3L), "doc_id", 2, 2, nFrames = 2)))
      java.nio.file.Files.write(dir.resolve("d.txt"), "not media".getBytes("UTF-8"))

      val all = Multimodal.readBinaryDir(spark, dir.toString)
      assert(all.count() === 4)
      val routed = Multimodal.routeModality(all, "content")
        .selectExpr("regexp_extract(path, '([a-z]+\\\\.[a-z]+)$', 1) AS f", "modality")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(routed === Map("a.png" -> "image", "b.wav" -> "audio",
        "c.gif" -> "video", "d.txt" -> "unknown"))
      // glob pushes into the file index: only the wav survives the listing
      val wavOnly = Multimodal.readBinaryDir(spark, dir.toString, glob = "*.wav")
      assert(wavOnly.select("path").collect().map(_.getString(0)).toSeq
        .forall(_.endsWith("b.wav")) && wavOnly.count() === 1)
      // and the ingested bytes decode identically to the in-memory path
      val samples = Audio.JdkAudioCodec.pcmSamples(
        wavOnly.select("content").head().getAs[Array[Byte]](0)).get
      assert(samples.toSeq === (0 until 16).map(sample(2L, _)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

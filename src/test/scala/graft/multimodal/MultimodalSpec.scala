package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  def docs() = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, "another document"), (3L, "hello world"))
      .toDF("doc_id", "text")
  }

  test("attachBinary + extractMeta: header, length, digest are deterministic") {
    val meta = Multimodal.extractMeta(
      Multimodal.attachBinary(docs(), "text"), "payload")
      .orderBy("doc_id").collect()
    assert(meta.forall(_.getAs[String]("magic") == "IMG0"))
    assert(meta(0).getAs[Int]("n_bytes") === "hello world".length + 16)
    // identical content → identical digest; different content → different
    assert(meta(0).getAs[String]("digest") === meta(2).getAs[String]("digest"))
    assert(meta(0).getAs[String]("digest") !== meta(1).getAs[String]("digest"))
  }

  test("decode fallback (unrecognized container) is per-partition and stable; null payload → zeros") {
    import spark.implicits._
    val withNull = Multimodal.attachBinary(docs(), "text")
      .withColumn("payload",
        when(col("doc_id") === 2, lit(null).cast("binary")).otherwise(col("payload")))
    // decode twice → identical outputs (stub must be deterministic)
    def run() = Multimodal.decode(withNull, "payload")
      .select("doc_id", "width", "height", "n_frames").orderBy("doc_id")
      .collect().map(_.toSeq)
    val d1 = run(); val d2 = run()
    assert(d1 === d2)
    assert(d1(1)(1) === 0) // null payload → zero width
    assert(d1(0)(1).asInstanceOf[Int] > 0)
    assert(d1(0).drop(1) === d1(2).drop(1)) // same content, same dims
  }

  test("frameSample + featureStub: fan-out bounded by n and n_frames; 8-dim features") {
    val decoded = Multimodal.decode(
      Multimodal.extractMeta(Multimodal.attachBinary(docs(), "text"), "payload"), "payload")
    val frames = Multimodal.featureStub(Multimodal.frameSample(decoded, 3))
    val counts = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = decoded.select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts.foreach { case (id, c) => assert(c === math.min(nFrames(id), 3)) }
    val f = frames.select(size(col("features"))).head().getInt(0)
    assert(f === 8)
  }

  // ---- real-codec fixtures: images written by the test itself through
  // the same javax.imageio SPI the codec reads with -------------------
  private def solidImage(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }
  private def encodeImage(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no JDK writer for $fmt")
    baos.toByteArray
  }
  private def gif2Frames(w: Int, h: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 2).foreach { i =>
      writer.writeToSequence(
        new javax.imageio.IIOImage(solidImage(w, h, if (i == 0) 0x000000 else 0xFFFFFF), null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    baos.toByteArray
  }

  test("decode: real PNG/BMP/GIF payloads get exact javax.imageio dims; unknown containers fall back") {
    import spark.implicits._
    val fakePayload = ("IMG0" + "not-an-image-payload").getBytes("UTF-8")
    val rows = Seq(
      (1L, encodeImage(solidImage(37, 23, 0x336699), "png")),
      (2L, encodeImage(solidImage(5, 9, 0xFFFFFF), "bmp")),
      (3L, gif2Frames(4, 4)),
      (4L, fakePayload)
    ).toDF("doc_id", "payload")
    val out = Multimodal.decode(rows, "payload")
      .select("doc_id", "width", "height", "n_frames").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out(0) === ((1L, 37, 23, 1)))
    assert(out(1) === ((2L, 5, 9, 1)))
    assert(out(2) === ((3L, 4, 4, 2))) // animated GIF: real frame count
    // no registered reader for the fake container → declared fallback,
    // bit-identical to FakeCodec so the oracle-checked pipeline is stable
    val (fw, fh, ff) = Multimodal.FakeCodec.decode(fakePayload)
    assert(out(3) === ((4L, fw, fh, ff)))
    assert(Multimodal.JdkImageCodec.decodeDims(fakePayload).isEmpty)
  }

  test("imageFeatures: mean-luma grid is exact on solid and split images; null for non-images") {
    import spark.implicits._
    // left half black, right half white → grid=2 cells [0, 1, 0, 1]
    val split = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 16).foreach(x =>
      split.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)))
    val rows = Seq(
      (1L, encodeImage(solidImage(12, 12, 0x000000), "png")),
      (2L, encodeImage(solidImage(12, 12, 0xFFFFFF), "png")),
      (3L, encodeImage(split, "png")),
      (4L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.imageFeatures(rows, "payload", grid = 2)
      .select("doc_id", "img_features").orderBy("doc_id").collect()
    def feats(i: Int): Seq[Double] = out(i).getSeq[Double](1)
    assert(feats(0).forall(v => math.abs(v) < 1e-9))
    assert(feats(1).forall(v => math.abs(v - 1.0) < 1e-9))
    assert(feats(2).zip(Seq(0.0, 1.0, 0.0, 1.0))
      .forall { case (got, want) => math.abs(got - want) < 1e-9 })
    assert(out(3).isNullAt(1))
    assert(feats(0).length === 4)
  }

  test("synthesizePngPattern: encode → decode → luma roundtrip recovers the exact formula values") {
    import spark.implicits._
    val rows = Seq(Tuple1(0L), Tuple1(5L), Tuple1(300L)).toDF("doc_id")
    val out = Multimodal.imageFeatures(
        Multimodal.decode(Multimodal.synthesizePngPattern(rows, "doc_id", 2, 2), "payload"),
        "payload", grid = 2)
      .select("doc_id", "width", "height", "n_frames", "img_features")
      .orderBy("doc_id").collect()
    def expected(id: Long, x: Int, y: Int): Double = {
      val r = java.lang.Math.floorMod(id + 83L * x + 47L * y, 256L).toInt
      val g = java.lang.Math.floorMod(7L * id + 29L * x + 53L * y, 256L).toInt
      val b = java.lang.Math.floorMod(13L * id + 17L * x + 31L * y, 256L).toInt
      (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    }
    Seq(0L, 5L, 300L).zip(out).foreach { case (id, row) =>
      assert((row.getInt(1), row.getInt(2), row.getInt(3)) === ((2, 2, 1)))
      val feats = row.getSeq[Double](4)
      // PNG is lossless 8-bit RGB and grid=2 over a 2×2 image puts one
      // pixel per cell, so the roundtrip must be BIT-exact, not close
      val want = Seq(expected(id, 0, 0), expected(id, 1, 0),
        expected(id, 0, 1), expected(id, 1, 1))
      assert(feats.map(java.lang.Double.doubleToRawLongBits) ===
        want.map(java.lang.Double.doubleToRawLongBits), s"doc $id")
    }
  }

  test("embedding near-dup: planted duplicate found, no cartesian") {
    import spark.implicits._
    import graft.operators.Dedup
    val base = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val nearly = base.clone(); nearly(0) = base(0) + 0.001f
    val far = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, base), (2L, nearly), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      dim = 8, minCosine = 0.99, numPlanes = 8, bandBits = 2)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** REAL video-modality kernels over the JDK's multi-frame image SPI.
  * The JDK ships no mp4/webm codec, but it DOES ship a real multi-frame
  * container — animated GIF (and multi-page TIFF) — through the same
  * `javax.imageio` registry [[Multimodal.JdkImageCodec]] binds. That is
  * enough to make the video CONTRACT real end to end: container parse →
  * per-frame pixel decode → per-frame features, with the frame fan-out
  * and batch shapes a production ffmpeg binding would drop into
  * unchanged.
  *
  *   - [[JdkVideoCodec.frameLumaGrids]]: decode EVERY frame of a
  *     multi-frame container to mean-luma grids (the per-frame feature
  *     kernel — the image path decodes frame 0 only);
  *   - [[synthesizeGifPattern]]: the write side — a genuine animated
  *     GIF per row on an explicit 256-level gray palette (GIF is
  *     palette-indexed, so gray-on-gray is LOSSLESS) whose pixel
  *     (x, y, frame) derives from a documented integer formula, making
  *     the whole encode → decode → per-frame-feature pipeline
  *     ORACLE-CHECKABLE from id arithmetic alone (`mm_video_frames`);
  *   - [[videoFrameFeatures]]: decode + frame fan-out in one
  *     `mapPartitions` scan — one output row per frame, shuffle-free.
  *
  * Containers with no registered multi-frame reader keep the declared
  * [[Multimodal.FakeCodec]] fallback.
  */
object Video {

  object JdkVideoCodec {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    /** Decode every frame → one `grid × grid` mean-luma array per frame
      * (Rec. 601 over sRGB bytes, identical chain to the image kernel).
      * None when no registered reader recognizes the container.
      *
      * CONTRACT — no compositing: each frame is decoded AS STORED
      * (`reader.read(i)`), with no GIF disposal-method handling or
      * logical-screen placement. Full-frame sequences (everything
      * [[synthesizeGifPattern]] writes, and any encoder that emits
      * replace-mode frames) are exact; for delta/partial-frame GIFs the
      * per-frame features describe the stored fragment, not the rendered
      * frame. A production binding that needs rendered-frame semantics
      * composites each fragment onto the logical screen before
      * `lumaGridOf` — the feature chain downstream is unchanged. */
    def frameLumaGrids(bytes: Array[Byte], grid: Int): Option[Seq[Array[Double]]] = {
      val iis = Multimodal.JdkImageCodec.memStream(bytes)
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, false, true)
            val n = try { val k = r.getNumImages(true); if (k > 0) k else 1 }
              catch { case _: Exception => 1 }
            Some((0 until n).map(i => Multimodal.JdkImageCodec.lumaGridOf(r.read(i), grid)))
          } catch {
            case _: Exception => None // recognized magic but corrupt body
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    }
  }

  /** TEST-PATTERN animated-GIF synthesis — the write side of the real
    * multi-frame codec: per row, a genuine `nFrames`-frame animated GIF
    * (written through the JDK GIF sequence writer) on an explicit
    * 256-level grayscale palette, pixel (x, y) of frame f holding gray
    * level
    *
    *   v(x, y, f) = floorMod(seed + 83·x + 47·y + 131·f, 256)
    *
    * GIF palette indices are lossless, so a decode recovers these exact
    * levels; with r = g = b = v the luma chain reduces to the same
    * documented IEEE sequence both engines evaluate — the per-frame
    * features are oracle-recomputable from seed arithmetic alone. */
  def synthesizeGifPattern(df: DataFrame, seedCol: String, w: Int, h: Int,
      nFrames: Int, outCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { it =>
      import java.awt.image.{BufferedImage, IndexColorModel}
      import javax.imageio.{IIOImage, ImageIO}
      val ramp = Array.tabulate(256)(_.toByte)
      val grayPalette = new IndexColorModel(8, 256, ramp, ramp, ramp)
      it.map { r =>
        val seed = r.getLong(idx)
        val baos = new java.io.ByteArrayOutputStream()
        // memory-cached stream (ImageIO's default wrapper is a per-call
        // disk temp file — see JdkImageCodec.memStream)
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        try {
          writer.setOutput(ios)
          // The JDK GIF writer interlaces by default, and interlaced
          // frames do not round-trip pixel-exactly at small heights —
          // sequential row order is part of this contract.
          val param = writer.getDefaultWriteParam
          param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = java.lang.Math.floorMod(
                  seed + 83L * x + 47L * y + 131L * f, 256L).toInt
                raster.setSample(x, y, 0, v)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new IIOImage(img, null, null), param)
            f += 1
          }
          writer.endWriteSequence()
        } finally { ios.close(); writer.dispose() }
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(Encoders.row(schema))
  }

  /** Decode + frame fan-out: one output row PER FRAME, appending
    * `frame_idx` and that frame's `grid²`-dim mean-luma vector. Rows
    * whose payload has no multi-frame reader emit nothing (callers
    * route those through [[Multimodal.decode]]'s fallback instead).
    * Single `mapPartitions` scan: the container is parsed once per row,
    * every frame decoded in that pass — shuffle-free, scan-parallel. */
  def videoFrameFeatures(df: DataFrame, binCol: String, grid: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_features", ArrayType(DoubleType), nullable = false)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        if (r.isNullAt(idx)) Iterator.empty
        else JdkVideoCodec.frameLumaGrids(r.getAs[Array[Byte]](idx), grid) match {
          case Some(frames) => frames.iterator.zipWithIndex.map { case (g, i) =>
            Row.fromSeq(r.toSeq ++ Seq(i, g.toSeq))
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(schema))
  }
}

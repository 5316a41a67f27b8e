package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them. Image decode is REAL
  * — [[JdkImageCodec]] binds the JDK's own `javax.imageio` SPI (PNG /
  * JPEG / BMP / GIF / WBMP / TIFF readers ship with JDK 17; no external
  * dependency), for both container dims/frame-count and a full
  * pixel-decode feature kernel. Audio decode is REAL too —
  * [[Audio.JdkAudioCodec]] binds `javax.sound.sampled` (WAV/AIFF/AU) —
  * and the multi-frame video contract runs on real animated-GIF decode
  * ([[Video.JdkVideoCodec]]). Payloads no registered reader recognizes
  * (mp4/webm video codecs this JVM does not ship) fall back to the
  * deterministic [[FakeCodec]] so the pipeline shape stays total — swap
  * that fallback for a javacv/ffmpeg binding to productionize those
  * formats; nothing else changes.
  *
  * Scale posture: decode runs inside `mapPartitions` (one codec context
  * per task, no per-row setup), metadata extraction is pure codegen'd
  * expressions, and frame sampling is `posexplode` — all
  * shuffle-free, scan-parallel operations.
  */
object Multimodal {

  /** Deterministic fake payload: what an ingest job would have fetched.
    * A 16-byte fake header (magic + dims derived from the content hash)
    * followed by the content bytes. */
  def attachBinary(df: DataFrame, textCol: String, outCol: String = "payload"): DataFrame =
    df.withColumn(outCol,
      concat(
        lit("IMG0").cast("binary"),
        substring(sha2(col(textCol).cast("binary"), 256), 1, 12).cast("binary"),
        col(textCol).cast("binary")))

  /** Pure-expression metadata over the binary column: byte length, content
    * digest, magic prefix. No decode required — this is the cheap path
    * that runs over 100 TB without touching a codec. */
  def extractMeta(df: DataFrame, binCol: String): DataFrame =
    df
      .withColumn("n_bytes", length(col(binCol)))
      .withColumn("digest", md5(col(binCol)))
      .withColumn("magic", substring(col(binCol), 1, 4).cast("string"))

  /** Real image decode over the JDK's `javax.imageio` plugin registry —
    * no external dependency: JDK 17 ships PNG, JPEG, BMP, GIF, WBMP and
    * TIFF reader SPIs. Two entry points: [[decodeDims]] reads the
    * container header only (width/height/frame count without decoding
    * pixels — the cheap scan that can run over every payload), and
    * [[lumaGrid]] fully decodes pixels into a grid of mean-luminance
    * cells (the feature-extract kernel). Both are static pure functions
    * of the bytes: safe to call from any task, no shared codec state. */
  object JdkImageCodec {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    /** Header-only decode: (width, height, n_frames), or None when no
      * registered reader recognizes the container (the caller decides
      * the fallback). n_frames > 1 for animated GIF / multi-page TIFF;
      * readers that cannot cheaply count report 1. */
    /** In-memory image input stream: `ImageIO.createImageInputStream`
      * defaults to a DISK-backed cache (one temp file created and
      * deleted per call — measurable at corpus scan rates: ~1 s per
      * 5,000 payloads); payloads are already byte arrays, so the
      * memory-cached stream is strictly better on every decode path. */
    private[multimodal] def memStream(bytes: Array[Byte]) =
      new javax.imageio.stream.MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))

    /** `allowWbmp = false` (the [[routeModality]] sniff) skips the JDK
      * WBMP reader: its `canDecodeInput` is notoriously permissive (it
      * accepts any stream starting `0x00 0x00`), so on a mixed lake an
      * arbitrary non-image payload could be misrouted `image` with
      * garbage dims. Direct decode calls keep the default `true` —
      * there the caller has asserted the payload IS an image. */
    def decodeDims(bytes: Array[Byte], allowWbmp: Boolean = true): Option[(Int, Int, Int)] = {
      val iis = memStream(bytes)
      try {
        val readers = ImageIO.getImageReaders(iis)
        var result: Option[(Int, Int, Int)] = None
        var decided = false
        while (!decided && readers.hasNext) {
          val r = readers.next()
          val fmt = try r.getFormatName catch { case _: Exception => "" }
          if (!allowWbmp && fmt.equalsIgnoreCase("wbmp")) {
            r.dispose() // over-permissive sniffer; try the next SPI, if any
          } else {
            decided = true
            try {
              r.setInput(iis, false, true)
              val frames =
                try { val k = r.getNumImages(true); if (k > 0) k else 1 }
                catch { case _: Exception => 1 }
              result = Some((r.getWidth(0), r.getHeight(0), frames))
            } catch {
              case _: Exception => result = None // recognized magic but corrupt body
            } finally r.dispose()
          }
        }
        result
      } finally if (iis != null) iis.close()
    }

    /** Full pixel decode → `grid × grid` mean-luminance cells in [0, 1],
      * row-major (Rec. 601 luma over sRGB bytes). The real counterpart
      * of [[featureStub]] for decodable payloads; None when the bytes
      * aren't a decodable image. */
    def lumaGrid(bytes: Array[Byte], grid: Int): Option[Array[Double]] = {
      val img = try ImageIO.read(memStream(bytes))
        catch { case _: Exception => null }
      if (img == null) None else Some(lumaGridOf(img, grid))
    }

    /** The per-image kernel behind [[lumaGrid]], shared with the
      * multi-frame video path ([[Video.JdkVideoCodec]]): identical IEEE
      * chain whichever container the pixels came from. */
    def lumaGridOf(img: java.awt.image.BufferedImage, grid: Int): Array[Double] = {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = Array.ofDim[Double](grid * grid)
        var gy = 0
        while (gy < grid) {
          val y0 = gy * h / grid; val y1 = math.max((gy + 1) * h / grid, y0 + 1)
          var gx = 0
          while (gx < grid) {
            val x0 = gx * w / grid; val x1 = math.max((gx + 1) * w / grid, x0 + 1)
            var sum = 0.0; var n = 0
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
                sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
                n += 1; x += 1
              }
              y += 1
            }
            out(gy * grid + gx) = if (n == 0) 0.0 else sum / n
            gx += 1
          }
          gy += 1
        }
        out
    }
  }

  /** FALLBACK codec for payloads neither `javax.imageio` ([[JdkImageCodec]],
    * [[Video.JdkVideoCodec]]) nor `javax.sound.sampled`
    * ([[Audio.JdkAudioCodec]]) has a reader for — i.e. only video codecs
    * this JVM does not ship (mp4/webm): deterministic pseudo-decode
    * of the leading bytes, stable across runs — keeps the pipeline
    * total and testable. A production build binds javacv/ffmpeg here;
    * the signature — bytes in, (width, height, n_frames) out — is the
    * real contract. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      // fake: derive dims from the first header bytes; stable across runs
      val h = java.util.Arrays.hashCode(bytes.take(16))
      val w = 64 + math.abs(h % 1024)
      val ht = 64 + math.abs((h / 1024) % 1024)
      val frames = 1 + math.abs(h % 8)
      (w, ht, frames)
    }
  }

  /** Decode pass: `mapPartitions` (codec state is per-task, never
    * per-row); appends width/height/n_frames. Real `javax.imageio`
    * header decode for any container the JDK recognizes; [[FakeCodec]]
    * for the rest (declared fallback, see object doc). */
  def decode(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) =
          if (r.isNullAt(idx)) (0, 0, 0)
          else {
            val bytes = r.getAs[Array[Byte]](idx)
            JdkImageCodec.decodeDims(bytes).getOrElse(FakeCodec.decode(bytes))
          }
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(Encoders.row(schema))
  }

  /** TEST-PATTERN image synthesis — the write side of the real codec:
    * per row, a genuine `w × h` PNG (encoded through the same
    * `javax.imageio` SPI [[JdkImageCodec]] reads back) whose pixel
    * (x, y) color derives deterministically from the row id:
    *
    *   r = (id + 83·x + 47·y) mod 256
    *   g = (7·id + 29·x + 53·y) mod 256
    *   b = (13·id + 17·x + 31·y) mod 256
    *
    * The formula is part of the contract: PNG is lossless 8-bit RGB, so
    * a decode of the produced payload recovers these exact channel
    * values, which makes the whole encode → decode → pixel-feature
    * pipeline ORACLE-CHECKABLE — any SQL engine can recompute the
    * expected luma from `id` arithmetic alone (`mm_image_pipeline`).
    * Same `mapPartitions` scan shape as [[decode]]. */
  def synthesizePngPattern(df: DataFrame, idCol: String, w: Int, h: Int,
      outCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val red = java.lang.Math.floorMod(id + 83L * x + 47L * y, 256L).toInt
            val grn = java.lang.Math.floorMod(7L * id + 29L * x + 53L * y, 256L).toInt
            val blu = java.lang.Math.floorMod(13L * id + 17L * x + 31L * y, 256L).toInt
            img.setRGB(x, y, (red << 16) | (grn << 8) | blu)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        // memory-cached stream: ImageIO's default OutputStream wrapper is
        // disk-backed (temp file per row) — see JdkImageCodec.memStream
        val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        javax.imageio.ImageIO.write(img, "png", mos)
        mos.close()
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(Encoders.row(schema))
  }

  /** Real feature extraction for decodable images: appends
    * `img_features` — the `grid²`-dim mean-luma vector from
    * [[JdkImageCodec.lumaGrid]] — or null for payloads that aren't
    * decodable images (callers route those to [[featureStub]] or drop
    * them). Same `mapPartitions` shape as [[decode]]: scan-parallel,
    * shuffle-free, full pixel decode paid exactly once per row. */
  def imageFeatures(df: DataFrame, binCol: String, grid: Int = 8): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("img_features", ArrayType(DoubleType), nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val feats =
          if (r.isNullAt(idx)) null
          else JdkImageCodec.lumaGrid(r.getAs[Array[Byte]](idx), grid)
            .map(_.toSeq).orNull
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(schema))
  }

  /** File-system ingest for multimodal payloads: Spark's `binaryFile`
    * source reads whole files as (path, modificationTime, length,
    * content) rows — the realistic way raw image/audio/video objects
    * enter the lake before they're parquet payload columns. Globs push
    * into the file index (partition-level pruning over object listings);
    * `maxBytes` guards the 2 GB per-row binary ceiling at the source
    * rather than OOMing a task later. Feed the result straight to
    * [[routeModality]] / the decode kernels via the `content` column. */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*", maxBytes: Long = 256L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes)

  /** Modality ROUTER — the dispatch contract of a mixed-payload lake:
    * one `mapPartitions` scan sniffs each payload against the
    * registered JDK SPIs in a fixed order and appends
    *
    *   - `modality`: `image` (single-frame `javax.imageio` container),
    *     `video` (multi-frame one — animated GIF / multi-page TIFF),
    *     `audio` (`javax.sound.sampled` container), `unknown`;
    *   - image/video meta: `width` / `height` / `n_frames`;
    *   - audio meta: `sample_rate` / `n_samples`;
    *
    * with nulls in the columns the modality lacks. Sniffing reads
    * container headers only (no pixel/sample decode) — the cheap scan
    * that partitions a 100 TB lake by modality so each branch runs its
    * own decode kernel ([[imageFeatures]], [[Audio.audioFeatures]],
    * [[Video.videoFrameFeatures]]). `unknown` stays routable to the
    * declared [[FakeCodec]] fallback. The sniff excludes the JDK WBMP
    * reader (`allowWbmp = false`) and nulls out any audio field the
    * header leaves `NOT_SPECIFIED` — a router must not write sentinel
    * values (-1 frame counts, WBMP garbage dims) into the lake. */
  def routeModality(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("modality", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val extra: Seq[Any] =
          if (r.isNullAt(idx)) Seq("unknown", null, null, null, null, null)
          else {
            val bytes = r.getAs[Array[Byte]](idx)
            JdkImageCodec.decodeDims(bytes, allowWbmp = false) match {
              case Some((w, h, f)) =>
                Seq(if (f > 1) "video" else "image", w, h, f, null, null)
              case None => Audio.JdkAudioCodec.decodeMeta(bytes) match {
                case Some(meta) =>
                  Seq("audio", null, null, null,
                    meta.sampleRate.map(Int.box).orNull,
                    meta.nFrames.map(Long.box).orNull)
                case None => Seq("unknown", null, null, null, null, null)
              }
            }
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(schema))
  }

  /** Sample up to `n` evenly-spaced frame indices per decoded row —
    * the "video → frames" fan-out as a generator (explode), no shuffle.
    * k = min(n, n_frames) indices at `i * n_frames / k` (i in [0, k)). */
  def frameSample(decoded: DataFrame, n: Int): DataFrame = {
    val k = least(col("n_frames"), lit(n))
    decoded
      .withColumn("frame_idx", explode(
        when(col("n_frames") <= 0, array())
          .otherwise(transform(sequence(lit(0), k - 1),
            i => (i * col("n_frames") / k).cast("int")))))
      .withColumn("frame_key", concat_ws("#", col("digest"), col("frame_idx")))
  }

  /** Deterministic fake feature vector per frame (real impl: model
    * embedding). Pure expressions: stable hash → 8 pseudo-floats. */
  def featureStub(frames: DataFrame): DataFrame =
    frames.withColumn("features",
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(col("frame_key"), i), lit(1000)).cast("double") / 1000.0)))
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** REAL audio-modality kernels over the JDK's own sampled-audio stack —
  * `javax.sound.sampled` ships WAV / AIFF / AU readers and a WAV writer
  * with JDK 17, so like [[Multimodal.JdkImageCodec]] this binds no
  * external dependency. The shape mirrors the image path exactly:
  *
  *   - [[JdkAudioCodec.decodeMeta]]: container-header decode only
  *     (sample rate / channels / bits / frame count) — the cheap scan
  *     that can run over every payload of a 100 TB lake;
  *   - [[JdkAudioCodec.pcmSamples]]: full PCM decode to integer
  *     samples — the feature-extract kernel;
  *   - [[synthesizeWavPattern]]: the write side — a genuine RIFF/WAVE
  *     payload per row whose samples derive from a documented integer
  *     formula, which makes the whole encode → decode → feature
  *     pipeline ORACLE-CHECKABLE (PCM is lossless, the features are
  *     exact BIGINT sums — any SQL engine recomputes them from id
  *     arithmetic alone);
  *   - [[audioFeatures]]: decode + per-frame energy envelope in one
  *     `mapPartitions` scan — shuffle-free, scan-parallel, the decode
  *     paid exactly once per row.
  *
  * Payloads the sampled-audio SPI does not recognize keep the declared
  * [[Multimodal.FakeCodec]] fallback (now only genuinely-unsupported
  * containers: video codecs this JVM does not ship).
  */
object Audio {

  /** Header metadata with `AudioSystem.NOT_SPECIFIED` (-1) sentinels
    * already mapped to None — streamed AU headers and some containers
    * legitimately omit frame length or rate, and a -1 written into the
    * lake would read as a real value downstream. */
  final case class AudioMeta(sampleRate: Option[Int], channels: Int,
      bitsPerSample: Int, nFrames: Option[Long])

  /** Pure-JDK audio container decode via `javax.sound.sampled`. Static
    * pure functions of the bytes — safe from any task, no shared codec
    * state, same posture as [[Multimodal.JdkImageCodec]]. */
  object JdkAudioCodec {
    import java.io.ByteArrayInputStream
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

    /** Header-only decode, or None when no registered provider recognizes
      * the container. Reads the RIFF/AIFF/AU header, never the sample
      * data. Fields the header leaves `NOT_SPECIFIED` come back None
      * inside [[AudioMeta]], never as the -1 sentinel. */
    def decodeMeta(bytes: Array[Byte]): Option[AudioMeta] =
      try {
        val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
        val f = aff.getFormat
        Some(AudioMeta(
          Option(f.getSampleRate.toInt).filter(_ > 0),
          f.getChannels, f.getSampleSizeInBits,
          Option(aff.getFrameLength.toLong).filter(_ >= 0)))
      } catch {
        case _: UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    /** Full PCM decode → channel-interleaved integer samples. Supports
      * the PCM_SIGNED 16-bit layout [[synthesizeWavPattern]] writes (and
      * any other 16-bit signed stream a provider yields), both
      * endiannesses. None when the container is unrecognized or not
      * 16-bit PCM — callers route those to the declared fallback. */
    def pcmSamples(bytes: Array[Byte]): Option[Array[Int]] =
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED || f.getSampleSizeInBits != 16) None
          else {
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            val out = new Array[Int](n)
            val be = f.isBigEndian
            var i = 0
            while (i < n) {
              val b0 = raw(2 * i) & 0xFF; val b1 = raw(2 * i + 1) & 0xFF
              out(i) = if (be) (b0 << 8 | b1).toShort.toInt else (b1 << 8 | b0).toShort.toInt
              i += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch {
        case _: UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** TEST-PATTERN audio synthesis — the write side of the real codec:
    * per row, a genuine 16-bit PCM mono RIFF/WAVE payload (written
    * through the same `javax.sound.sampled` SPI the codec reads back)
    * whose sample `i` derives deterministically from the row's seed:
    *
    *   sample(i) = floorMod(seed · 7919 + i · 104729, 65536) − 32768
    *
    * The formula is part of the contract: PCM is lossless, so a decode
    * recovers these exact values and any SQL engine can recompute the
    * per-frame energies from seed arithmetic alone (`mm_audio_pipeline`).
    * Seeds are non-negative in practice, where `floorMod ≡ %` on both
    * engines. Same `mapPartitions` scan shape as the image synthesis. */
  def synthesizeWavPattern(df: DataFrame, seedCol: String, nSamples: Int,
      sampleRate: Int = 8000, outCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { it =>
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      it.map { r =>
        val seed = r.getLong(idx)
        val pcm = new Array[Byte](nSamples * 2)
        var i = 0
        while (i < nSamples) {
          val s = java.lang.Math.floorMod(seed * 7919L + i.toLong * 104729L, 65536L).toInt - 32768
          pcm(2 * i) = (s & 0xFF).toByte          // little-endian 16-bit
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(Encoders.row(schema))
  }

  /** Real audio feature extraction: decode + per-frame energy envelope
    * in one pass. Appends `sample_rate`, `n_channels`, `n_samples` and
    * `frame_energy` — `ceil(n / frameLen)` exact BIGINT sums of |sample|
    * over consecutive frames of `frameLen` interleaved samples — or
    * nulls for payloads that aren't decodable 16-bit PCM audio. Energies
    * are integers, so shards of a 100 TB corpus can aggregate or compare
    * them with no float-order drift — the same exactness discipline the
    * sketch operators use. */
  def audioFeatures(df: DataFrame, binCol: String, frameLen: Int): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("frame_energy", ArrayType(LongType), nullable = true)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val extra: Seq[Any] =
          if (r.isNullAt(idx)) Seq(null, null, null, null)
          else {
            val bytes = r.getAs[Array[Byte]](idx)
            (JdkAudioCodec.decodeMeta(bytes), JdkAudioCodec.pcmSamples(bytes)) match {
              case (Some(meta), Some(samples)) =>
                val nFrames = (samples.length + frameLen - 1) / frameLen
                val energy = new Array[Long](math.max(nFrames, 0))
                var i = 0
                while (i < samples.length) {
                  energy(i / frameLen) += math.abs(samples(i).toLong)
                  i += 1
                }
                // n_samples comes from the DECODED stream (exact), so only
                // the header-declared rate can be NOT_SPECIFIED → null here
                Seq(meta.sampleRate.map(Int.box).orNull, meta.channels,
                  samples.length.toLong, energy.toSeq)
              case _ => Seq(null, null, null, null)
            }
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(schema))
  }
}

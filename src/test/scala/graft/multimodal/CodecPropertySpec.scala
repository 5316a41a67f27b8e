package graft.multimodal

import graft.SparkSpec
import org.scalacheck.Gen

/** Property evidence for the codec contracts behind the oracle-checked
  * multimodal queries: the synthesize → encode → decode roundtrip must
  * be BIT-exact for arbitrary seeds and container geometries, not just
  * the fixture shapes — PNG and gray-palette GIF are lossless and WAV
  * is PCM, so any deviation is a codec-binding bug, never "tolerance".
  * Same rolled deterministic forAll as BpePropertySpec (the
  * scalatestplus bridge isn't in the offline cache). Each case runs the
  * real DataFrame operators on a 1-row frame: the case count is small
  * by design, the point is adversarial GEOMETRY coverage (1-pixel
  * images, single-sample audio, ragged frame tails, tall/wide grids,
  * negative seeds) that fixed fixtures never exercise. */
class CodecPropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], cases: Int)(check: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach { a =>
        try check(a)
        catch { case e: Throwable => fail(s"failed for input (seed $i): $a", e) }
      }
    }

  private def one(seed: Long) = {
    import spark.implicits._
    Seq(Tuple1(seed)).toDF("doc_id")
  }

  private def expectedSample(seed: Long, i: Int): Int =
    java.lang.Math.floorMod(seed * 7919L + i.toLong * 104729L, 65536L).toInt - 32768

  test("property: WAV roundtrip is sample-exact for arbitrary seeds, lengths, rates") {
    val gen = for {
      seed <- Gen.choose(Long.MinValue / 8, Long.MaxValue / 8)
      n <- Gen.choose(1, 700)
      rate <- Gen.oneOf(8000, 16000, 44100)
    } yield (seed, n, rate)
    forAll(gen, 10) { case (seed, n, rate) =>
      val bytes = Audio.synthesizeWavPattern(one(seed), "doc_id", n, rate)
        .select("payload").head().getAs[Array[Byte]](0)
      assert(Audio.JdkAudioCodec.decodeMeta(bytes) ===
        Some(Audio.AudioMeta(Some(rate), 1, 16, Some(n.toLong))))
      val got = Audio.JdkAudioCodec.pcmSamples(bytes).get
      assert(got.length === n)
      assert(got.toSeq === (0 until n).map(expectedSample(seed, _)))
    }
  }

  test("property: audioFeatures partitions Σ|sample| exactly for arbitrary frame lengths") {
    val gen = for {
      seed <- Gen.choose(-100000L, 100000L)
      n <- Gen.choose(1, 300)
      frameLen <- Gen.choose(1, 50)
    } yield (seed, n, frameLen)
    forAll(gen, 8) { case (seed, n, frameLen) =>
      val energy = Audio.audioFeatures(
          Audio.synthesizeWavPattern(one(seed), "doc_id", n), "payload", frameLen)
        .select("frame_energy").head().getSeq[Long](0)
      val want = (0 until n).map(i => (i / frameLen, math.abs(expectedSample(seed, i)).toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(energy.length === (n + frameLen - 1) / frameLen)
      energy.zipWithIndex.foreach { case (e, f) => assert(e === want(f), s"frame $f") }
    }
  }

  test("property: PNG pattern roundtrip is luma-exact at one-pixel-per-cell for arbitrary dims") {
    val gen = for {
      seed <- Gen.choose(-1000000L, 1000000L)
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 9)
    } yield (seed, w, h)
    forAll(gen, 8) { case (seed, w, h) =>
      val bytes = Multimodal.synthesizePngPattern(one(seed), "doc_id", w, h)
        .select("payload").head().getAs[Array[Byte]](0)
      assert(Multimodal.JdkImageCodec.decodeDims(bytes) === Some((w, h, 1)))
      // grid = max(w, h) puts AT MOST one pixel per non-empty cell; empty
      // cells (clamped ranges revisit a pixel) still match the formula
      val grid = math.max(w, h)
      val got = Multimodal.JdkImageCodec.lumaGrid(bytes, grid).get
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val x0 = gx * w / grid; val y0 = gy * h / grid
          val x = math.min(x0, w - 1); val y = math.min(y0, h - 1)
          val r = java.lang.Math.floorMod(seed + 83L * x + 47L * y, 256L).toInt
          val g = java.lang.Math.floorMod(7L * seed + 29L * x + 53L * y, 256L).toInt
          val b = java.lang.Math.floorMod(13L * seed + 17L * x + 31L * y, 256L).toInt
          val want = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          assert(java.lang.Double.doubleToRawLongBits(got(gy * grid + gx)) ===
            java.lang.Double.doubleToRawLongBits(want), s"cell ($gx,$gy) of ${w}x$h")
          gx += 1
        }
        gy += 1
      }
    }
  }

  test("property: gray-GIF multi-frame roundtrip is value-exact for arbitrary geometry") {
    val gen = for {
      seed <- Gen.choose(-1000000L, 1000000L)
      w <- Gen.choose(1, 6)
      h <- Gen.choose(1, 6)
      frames <- Gen.choose(1, 5)
    } yield (seed, w, h, frames)
    forAll(gen, 8) { case (seed, w, h, frames) =>
      val bytes = Video.synthesizeGifPattern(one(seed), "doc_id", w, h, frames)
        .select("payload").head().getAs[Array[Byte]](0)
      assert(Multimodal.JdkImageCodec.decodeDims(bytes) === Some((w, h, frames)))
      val grids = Video.JdkVideoCodec.frameLumaGrids(bytes, grid = 1).get
      assert(grids.length === frames)
      grids.zipWithIndex.foreach { case (g, f) =>
        var sum = 0.0
        (0 until h).foreach(y => (0 until w).foreach { x =>
          val v = java.lang.Math.floorMod(seed + 83L * x + 47L * y + 131L * f, 256L).toInt
          sum += (0.299 * v + 0.587 * v + 0.114 * v) / 255.0
        })
        assert(java.lang.Double.doubleToRawLongBits(g(0)) ===
          java.lang.Double.doubleToRawLongBits(sum / (w * h)), s"frame $f of ${w}x$h")
      }
    }
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import QueryShared._

/** Multimodal binary-column queries — metadata scan, image / audio /
  * video decode pipelines (all REAL pure-JDK codecs: `javax.imageio`
  * for single- and multi-frame images, `javax.sound.sampled` for PCM
  * audio), the FakeCodec fallback contract, and the multimodal members
  * of the near-dup family. The image/GIF/WAV test patterns are written
  * through the same JDK SPIs the codecs read back, with documented
  * integer pixel/sample formulas — lossless containers make every
  * pipeline oracle-recomputable from id arithmetic alone.
  * mm_binary_meta / mm_decode_frames / mm_image_pipeline /
  * mm_image_neardup moved verbatim from [[NemQueries]]. */
private[queries] object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // Multimodal: binary payload metadata via pure expressions. The
    // payload is text-bytes + a fake 16-byte header; n_bytes and digest
    // are oracle-checkable because both engines hash the same utf8 bytes.
    Q("mm_binary_meta",
      (s, d) => {
        val withBin = graft.multimodal.Multimodal.attachBinary(
          T(s, d, "documents"), "text")
        graft.multimodal.Multimodal.extractMeta(withBin, "payload")
          .select(col("doc_id"), col("n_bytes"), col("magic"),
            md5(col("text").cast("binary")).as("text_digest"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, octet_length(encode(text)) + 16 AS n_bytes,
                     'IMG0' AS magic, md5(text) AS text_digest
              FROM documents ORDER BY doc_id""")),


    // Multimodal decode → frame-sample → feature pipeline. The decode is
    // the real javax.imageio path (MultimodalSpec pins PNG/BMP/GIF dims
    // and frame counts); these synthetic payloads carry an IMG0 container
    // no JDK reader recognizes, so this query exercises the declared
    // FakeCodec FALLBACK — deterministic 32-bit arithmetic over the
    // 16-byte fake header (Java Arrays.hashCode fold), which the oracle
    // replicates with wrap-around modular math and checks end to end.
    Q("mm_decode_frames",
      (s, d) => {
        import graft.multimodal.Multimodal._
        val decoded = decode(
          extractMeta(attachBinary(T(s, d, "documents"), "text"), "payload"), "payload")
        featureStub(frameSample(decoded, 3))
          .groupBy("doc_id")
          .agg(first(col("width")).as("width"), first(col("height")).as("height"),
            count(lit(1)).as("n_sampled_frames"), first(size(col("features"))).as("feat_dim"))
          .orderBy("doc_id")
      },
      // header = 'IMG0' + first 12 hex chars of sha256(text); h = Java
      // Arrays.hashCode over the 17-element [1 seeded] fold with int32
      // wrap ((x+2^31) floor-mod 2^32 - 2^31); dims/frames from h exactly
      // as FakeCodec.decode; n_sampled_frames = min(3, frames)
      Some("""WITH hdr AS (SELECT doc_id, substr(sha256(text), 1, 12) AS hx FROM documents),
                   bytes AS (SELECT doc_id,
                               list_transform([73, 77, 71, 48] ||
                                 list_transform(range(1, 13), i -> ascii(substr(hx, CAST(i AS INTEGER), 1))),
                                 x -> CAST(x AS BIGINT)) AS bs
                             FROM hdr),
                   hv AS (SELECT doc_id,
                            list_reduce([CAST(1 AS BIGINT)] || bs,
                              (a, b) -> CAST((((a * 31 + b + 2147483648) % 4294967296 + 4294967296) % 4294967296)
                                             - 2147483648 AS BIGINT)) AS h
                          FROM bytes),
                   dims AS (SELECT doc_id,
                              64 + abs(h % 1024) AS width,
                              64 + abs(CAST(trunc(h / 1024.0) AS BIGINT) % 1024) AS height,
                              1 + abs(h % 8) AS frames
                            FROM hv)
              SELECT doc_id, width, height,
                     least(frames, 3) AS n_sampled_frames, 8 AS feat_dim
              FROM dims ORDER BY doc_id""")),


    // REAL-codec multimodal pipeline, oracle-checked end to end: per doc
    // a genuine 2×2 PNG is encoded through javax.imageio with a pixel
    // pattern derived from doc_id (synthesizePngPattern's documented
    // formula), decoded back (real header parse → dims/frames), and the
    // pixel kernel (lumaGrid at grid=2 → one pixel per cell, so the
    // mean is the pixel's exact luma) recovers values DuckDB recomputes
    // from doc_id arithmetic alone — PNG is lossless 8-bit RGB, both
    // engines evaluate the identical (0.299r + 0.587g + 0.114b)/255
    // double chain, so the comparison is bit-exact.
    Q("mm_image_pipeline",
      (s, d) => {
        import graft.multimodal.Multimodal._
        val docs = T(s, d, "documents").select("doc_id").orderBy("doc_id").limit(256)
        val feats = imageFeatures(
          decode(synthesizePngPattern(docs, "doc_id", 2, 2), "payload"),
          "payload", grid = 2)
        feats.select(col("doc_id"), col("width"), col("height"), col("n_frames"),
            element_at(col("img_features"), 1).as("luma_00"),
            element_at(col("img_features"), 2).as("luma_10"),
            element_at(col("img_features"), 3).as("luma_01"),
            element_at(col("img_features"), 4).as("luma_11"))
          .orderBy("doc_id")
      },
      // luma_xy = pixel (x, y); channel formulas mirror
      // synthesizePngPattern: r=(id+83x+47y)%256, g=(7id+29x+53y)%256,
      // b=(13id+17x+31y)%256 — doc_id ≥ 0 so % matches floorMod
      Some("""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 256)
              SELECT doc_id, 2 AS width, 2 AS height, 1 AS n_frames,
                     (0.299::DOUBLE * (doc_id % 256) + 0.587::DOUBLE * ((7*doc_id) % 256)
                      + 0.114::DOUBLE * ((13*doc_id) % 256)) / 255.0::DOUBLE AS luma_00,
                     (0.299::DOUBLE * ((doc_id + 83) % 256) + 0.587::DOUBLE * ((7*doc_id + 29) % 256)
                      + 0.114::DOUBLE * ((13*doc_id + 17) % 256)) / 255.0::DOUBLE AS luma_10,
                     (0.299::DOUBLE * ((doc_id + 47) % 256) + 0.587::DOUBLE * ((7*doc_id + 53) % 256)
                      + 0.114::DOUBLE * ((13*doc_id + 31) % 256)) / 255.0::DOUBLE AS luma_01,
                     (0.299::DOUBLE * ((doc_id + 83 + 47) % 256) + 0.587::DOUBLE * ((7*doc_id + 29 + 53) % 256)
                      + 0.114::DOUBLE * ((13*doc_id + 17 + 31) % 256)) / 255.0::DOUBLE AS luma_11
              FROM ids ORDER BY doc_id""")),


    // IMAGE near-duplicate detection — the multimodal member of the
    // dedup family: real PNGs (4×4 test pattern), real decode, 16-dim
    // centered luma-grid features, then the SAME hyperplane-bucketed
    // near-dup operator the text embeddings use (no cartesian — LSH
    // band equi-join). The pattern is periodic in doc_id mod 256, so
    // ids congruent mod 256 render IDENTICAL images (cosine 1, always
    // co-bucketed ⇒ recall 1 for exact dups) and the expected pair set
    // is pure id arithmetic — while distinct patterns sit far below the
    // 0.999 gate (16-dim centered random cosine mass there is ~1e-13).
    Q("mm_image_neardup",
      (s, d) => {
        import graft.multimodal.Multimodal._
        val docs = T(s, d, "documents").select("doc_id").orderBy("doc_id").limit(512)
        val feats = imageFeatures(
            decode(synthesizePngPattern(docs, "doc_id", 4, 4), "payload"),
            "payload", grid = 4)
          .select(col("doc_id"),
            transform(col("img_features"), x => x - lit(0.5)).as("centered"))
        graft.operators.Dedup.embeddingNearDupPairs(feats, "doc_id", "centered",
            dim = 16, minCosine = 0.999, numPlanes = 8, bandBits = 2)
          .select(col("id_a"), col("id_b"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 512)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM ids a JOIN ids b
                ON b.doc_id % 256 = a.doc_id % 256 AND b.doc_id > a.doc_id
              ORDER BY id_a, id_b""")),


    // REAL-codec AUDIO pipeline, oracle-checked end to end: per doc a
    // genuine 16-bit PCM mono RIFF/WAVE payload is written through
    // javax.sound.sampled with sample(i) = (doc_id·7919 + i·104729)
    // mod 65536 − 32768 (synthesizeWavPattern's documented formula),
    // decoded back (real RIFF header parse → rate/channels/length) and
    // reduced to per-frame energies Σ|sample| over 64-sample frames.
    // PCM is lossless and the energies are exact BIGINT sums, so DuckDB
    // recomputes every output from doc_id arithmetic alone — the audio
    // sibling of mm_image_pipeline.
    Q("mm_audio_pipeline",
      (s, d) => {
        import graft.multimodal.Audio._
        val docs = T(s, d, "documents").select("doc_id").orderBy("doc_id").limit(256)
        val feats = audioFeatures(
          synthesizeWavPattern(docs, "doc_id", nSamples = 256, sampleRate = 8000),
          "payload", frameLen = 64)
        feats.select(col("doc_id"), col("sample_rate"), col("n_channels"), col("n_samples"),
            element_at(col("frame_energy"), 1).as("energy_0"),
            element_at(col("frame_energy"), 2).as("energy_1"),
            element_at(col("frame_energy"), 3).as("energy_2"),
            element_at(col("frame_energy"), 4).as("energy_3"))
          .orderBy("doc_id")
      },
      // doc_id ≥ 0 and i ≥ 0 so % matches floorMod; m ∈ [0, 65535] so
      // abs(m − 32768) is the decoded sample's magnitude exactly
      Some("""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 256),
                   smp AS (SELECT doc_id, CAST(i // 64 AS INTEGER) AS f,
                                  abs((doc_id * 7919 + i * 104729) % 65536 - 32768) AS a
                           FROM ids, range(0, 256) t(i))
              SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
                     CAST(256 AS BIGINT) AS n_samples,
                     CAST(sum(CASE WHEN f = 0 THEN a END) AS BIGINT) AS energy_0,
                     CAST(sum(CASE WHEN f = 1 THEN a END) AS BIGINT) AS energy_1,
                     CAST(sum(CASE WHEN f = 2 THEN a END) AS BIGINT) AS energy_2,
                     CAST(sum(CASE WHEN f = 3 THEN a END) AS BIGINT) AS energy_3
              FROM smp GROUP BY doc_id ORDER BY doc_id""")),


    // AUDIO near-duplicate detection — the audio member of the dedup
    // family: real WAVs seeded by doc_id mod 64 (ids congruent mod 64
    // carry IDENTICAL audio), real PCM decode, 16-frame energy envelope
    // centered by its theoretical mean (64·16384 per 64-sample frame —
    // energies are sums of |uniform([−32768, 32767])|), then the SAME
    // hyperplane-bucketed near-dup operator the text/image embeddings
    // use. Exact dups have cosine 1 and identical LSH buckets (recall
    // 1); the max cross-seed envelope cosine is 0.980 — measured over
    // all 2,016 distinct-seed pairs — below the 0.999 verify gate with
    // fully deterministic integer features (no flake surface), so the
    // expected pair set is pure id arithmetic.
    Q("mm_audio_neardup",
      (s, d) => {
        import graft.multimodal.Audio._
        val docs = T(s, d, "documents").select("doc_id").orderBy("doc_id").limit(512)
          .withColumn("seed", col("doc_id") % 64)
        val feats = audioFeatures(
            synthesizeWavPattern(docs, "seed", nSamples = 1024, sampleRate = 8000),
            "payload", frameLen = 64)
          .select(col("doc_id"),
            transform(col("frame_energy"),
              e => (e - lit(1048576L)).cast("double")).as("centered"))
        graft.operators.Dedup.embeddingNearDupPairs(feats, "doc_id", "centered",
            dim = 16, minCosine = 0.999, numPlanes = 8, bandBits = 2)
          .select(col("id_a"), col("id_b"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 512)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM ids a JOIN ids b
                ON b.doc_id % 64 = a.doc_id % 64 AND b.doc_id > a.doc_id
              ORDER BY id_a, id_b""")),


    // REAL multi-frame VIDEO pipeline, oracle-checked per frame: per doc
    // a genuine 3-frame animated GIF on an explicit 256-gray palette
    // (synthesizeGifPattern's documented formula v = (doc_id + 83x +
    // 47y + 131f) mod 256), parsed and pixel-decoded frame by frame by
    // the real javax.imageio GIF reader, fanned out to one row per
    // frame with that frame's luma grid. GIF indices are lossless and
    // gray pixels make r = g = b = v, so both engines evaluate the
    // identical (0.299v + 0.587v + 0.114v)/255 chain — bit-exact, from
    // id arithmetic alone. The frame fan-out IS the video contract; an
    // ffmpeg binding would swap in under the same shapes.
    Q("mm_video_frames",
      (s, d) => {
        import graft.multimodal.Video._
        val docs = T(s, d, "documents").select("doc_id").orderBy("doc_id").limit(128)
        val frames = videoFrameFeatures(
          synthesizeGifPattern(docs, "doc_id", 2, 2, nFrames = 3), "payload", grid = 2)
        frames.select(col("doc_id"), col("frame_idx"),
            element_at(col("frame_features"), 1).as("luma_00"),
            element_at(col("frame_features"), 2).as("luma_10"),
            element_at(col("frame_features"), 3).as("luma_01"),
            element_at(col("frame_features"), 4).as("luma_11"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 128),
                   fr AS (SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
                                 doc_id + 131 * f AS base
                          FROM ids, range(0, 3) t(f))
              SELECT doc_id, frame_idx,
                     (0.299::DOUBLE * (base % 256) + 0.587::DOUBLE * (base % 256)
                      + 0.114::DOUBLE * (base % 256)) / 255.0::DOUBLE AS luma_00,
                     (0.299::DOUBLE * ((base + 83) % 256) + 0.587::DOUBLE * ((base + 83) % 256)
                      + 0.114::DOUBLE * ((base + 83) % 256)) / 255.0::DOUBLE AS luma_10,
                     (0.299::DOUBLE * ((base + 47) % 256) + 0.587::DOUBLE * ((base + 47) % 256)
                      + 0.114::DOUBLE * ((base + 47) % 256)) / 255.0::DOUBLE AS luma_01,
                     (0.299::DOUBLE * ((base + 83 + 47) % 256) + 0.587::DOUBLE * ((base + 83 + 47) % 256)
                      + 0.114::DOUBLE * ((base + 83 + 47) % 256)) / 255.0::DOUBLE AS luma_11
              FROM fr ORDER BY doc_id, frame_idx""")),


    // MODALITY ROUTER — the mixed-payload-lake contract: one header-only
    // sniff pass dispatches every payload to its decode branch. The
    // fixture interleaves all four modalities by doc_id mod 4 (real PNG /
    // real WAV / real 2-frame animated GIF / an unrecognizable RAW0
    // container), so the oracle derives the full routing table — modality
    // AND its per-modality metadata — from id arithmetic alone. Header
    // sniffing never decodes pixels or samples: this is the cheap scan
    // that partitions 100 TB by modality before the per-branch kernels.
    Q("mm_modality_route",
      (s, d) => {
        import graft.multimodal.{Audio, Multimodal, Video}
        val docs = T(s, d, "documents").select("doc_id").orderBy("doc_id").limit(384)
        val m = col("doc_id") % 4
        val png = Multimodal.synthesizePngPattern(docs.filter(m === 0), "doc_id", 2, 2)
        val wav = Audio.synthesizeWavPattern(docs.filter(m === 1), "doc_id",
          nSamples = 32, sampleRate = 8000)
        val gif = Video.synthesizeGifPattern(docs.filter(m === 2), "doc_id", 2, 2, nFrames = 2)
        val unk = docs.filter(m === 3).withColumn("payload",
          concat(lit("RAW0").cast("binary"), col("doc_id").cast("string").cast("binary")))
        Multimodal.routeModality(
            png.unionByName(wav).unionByName(gif).unionByName(unk), "payload")
          .select(col("doc_id"), col("modality"), col("width"), col("height"),
            col("n_frames"), col("sample_rate"), col("n_samples"))
          .orderBy("doc_id")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 384)
              SELECT doc_id,
                     CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                     WHEN 2 THEN 'video' ELSE 'unknown' END AS modality,
                     CASE WHEN doc_id % 4 IN (0, 2) THEN 2 END AS width,
                     CASE WHEN doc_id % 4 IN (0, 2) THEN 2 END AS height,
                     CASE doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 2 END AS n_frames,
                     CASE WHEN doc_id % 4 = 1 THEN 8000 END AS sample_rate,
                     CASE WHEN doc_id % 4 = 1 THEN CAST(32 AS BIGINT) END AS n_samples
              FROM ids ORDER BY doc_id"""))
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Reference-pipeline (NEM) queries — split/compact roundtrips, the
  * crunch pipeline, settlement, compression study — plus the
  * multimodal binary-column surface.
  * Entries split from the monolithic Registry verbatim. */
private[queries] object NemQueries {

  val all: Seq[Q] = Seq(


    Q("nem_split_roundtrip",
      (s, _) => graft.sources.NemFixture.splitRoundtrip(s).orderBy("table"),
      None),


    Q("nem_compact_roundtrip",
      (s, _) => graft.sources.NemFixture.compactRoundtrip(s).orderBy("table", "partition"),
      None),


    // Compression study (S10/S11; reference README.md:14-27 chose
    // brotli-5 — that codec jar isn't bundled with Spark, so the engine
    // standardizes on zstd; this reports the actual trade-off on real data
    // the way the reference's study did. Rows-only (sizes are
    // environment-dependent).
    Q("nem_compression_study",
      (s, d) => {
        import s.implicits._
        // bounded deterministic sample: the codec RATIO is the result,
        // writing the full table per codec is just benchmark tax (r3 paid
        // 26 s for five serial 60 k-row writes). 10 k rows preserve the
        // ratio; the sample is persisted so each write scans the cache,
        // and the five writes run CONCURRENTLY — the zstd level rides the
        // per-write options (newHadoopConfWithOptions copies them into
        // that job's Hadoop conf), so there is no shared-conf race.
        // Levels mirror the reference's study (zstd 1/10/15 vs its
        // brotli-5 production pick, README.md:18-27; the brotli codec jar
        // is not bundled with Spark — see BASELINE.md).
        val li = T(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber").limit(10000)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        li.count()
        val out = java.nio.file.Files.createTempDirectory("graft_codec")
        val variants = IndexedSeq(("none", 0), ("snappy", 0), ("zstd", 1), ("zstd", 10), ("zstd", 15))
        val sizes = graft.Par.mapBounded(variants, 5) { case (codec, lvl) =>
          val label = if (lvl > 0) s"${codec}_l$lvl" else codec
          val w = li.coalesce(1).write.option("compression", codec)
          (if (lvl > 0) w.option("parquet.compression.codec.zstd.level", lvl.toString) else w)
            .parquet(s"$out/$label")
          val bytes = new java.io.File(s"$out/$label").listFiles()
            .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
          Some((label, bytes))
        }
        li.unpersist()
        sizes.toDF("codec", "bytes").orderBy("codec")
      },
      None),


    // FPP settlement tail (calcs.md steps 5-11) with inputs derived
    // deterministically from the events table so DuckDB can oracle-check
    // the whole chain: residual sums → DCF fallback → weighted charges.
    Q("nem_settlement",
      (s, d) => {
        val ev = T(s, d, "events")
        val perfSplit = ev.select(date_trunc("hour", col("ts")).as("ts"),
          col("value").as("raise_perf"), (-col("value") / lit(2.0)).as("lower_perf"))
        val hours = ev.select(col("event_type").as("constraintid"),
          date_trunc("hour", col("ts")).as("ts")).distinct()
        val cf = hours.withColumn("contribution_factor", lit(0.5))
        val defCf = hours.withColumn("default_contribution_factor", lit(0.8))
        val resDcf = hours.filter(col("constraintid") === "click")
          .withColumn("residual_dcf", lit(0.6))
        val perfRates = hours.withColumn("fpp_payment_rate", lit(10.0))
          .withColumn("fpp_recovery_rate", lit(20.0))
        val resRates = hours.withColumn("fpp", lit(1.0))
          .withColumn("used_fcas", lit(2.0)).withColumn("unused_fcas", lit(3.0))
        val (charges, _) = graft.pipeline.Crunch.settlement(
          perfSplit, cf, defCf, resDcf, perfRates, resRates)
        charges.select(col("constraintid"), col("ts"),
            round(col("used_dcf"), 6).as("used_dcf"),
            round(col("interval_charge"), 4).as("interval_charge"))
          .orderBy("constraintid", "ts")
      },
      Some("""WITH ev AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type, value
                          FROM events),
                   rs AS (SELECT h AS ts, sum(value) AS raise_residual_perf,
                                 sum(-value / 2.0::DOUBLE) AS lower_residual_perf
                          FROM ev GROUP BY 1),
                   hours AS (SELECT DISTINCT event_type AS constraintid, h AS ts FROM ev),
                   wd AS (SELECT hours.constraintid, hours.ts,
                                 rs.raise_residual_perf, rs.lower_residual_perf,
                                 CASE WHEN hours.constraintid = 'click' THEN 0.6::DOUBLE
                                      ELSE 0.8::DOUBLE END AS used_dcf
                          FROM hours LEFT JOIN rs ON hours.ts = rs.ts)
              SELECT constraintid, ts, round(used_dcf, 6) AS used_dcf,
                     round(raise_residual_perf * used_dcf * 10.0::DOUBLE
                           + lower_residual_perf * used_dcf * 20.0::DOUBLE, 4) AS interval_charge
              FROM wd ORDER BY constraintid, ts""")),


    // Full crunch pipeline (steps 1-4) over a deterministic in-memory
    // fixture; the oracle-checked per-step analogs are w01_ewma,
    // a07_keepfirst_dedup, j05_asof_interp, w06_spine_densify.
    Q("nem_crunch_pipeline",
      (s, _) => {
        import s.implicits._
        def t(x: String) = java.sql.Timestamp.from(java.time.Instant.parse(x))
        val freq = Seq(
          (t("2025-06-07T00:00:00Z"), "NSW1", 0.10, 0.0, 1.0),
          (t("2025-06-07T00:00:04Z"), "NSW1", -0.05, 0.0, 1.0),
          (t("2025-06-07T00:00:08Z"), "NSW1", 0.02, 0.0, 1.0))
          .toDF("MEASUREMENT_DATETIME", "REGIONID", "FREQ_DEVIATION_HZ",
            "FREQ_MEASURE_HZ", "HZ_QUALITY_FLAG")
        val preds = Seq(
          ("D1", t("2025-06-07T00:00:00Z"), t("2025-06-07T00:00:00Z"), t("2025-06-07T00:00:00Z"), "AWEFS_ASEFS", 10.0),
          ("D1", t("2025-06-07T00:05:00Z"), t("2025-06-07T00:00:00Z"), t("2025-06-07T00:00:00Z"), "AWEFS_ASEFS", 20.0))
          .toDF("DUID", "INTERVAL_DATETIME", "RUN_DATETIME", "OFFERDATETIME", "ORIGIN", "FORECAST_POE50")
        val scada = Seq(
          (t("2025-06-07T00:00:00Z"), "D1", 12.0),
          (t("2025-06-07T00:00:04Z"), "D1", 9.5),
          (t("2025-06-07T00:00:08Z"), "D1", 10.1))
          .toDF("MEASUREMENT_DATETIME", "FPP_UNITID", "MEASURED_MW")
        val fm = graft.pipeline.Crunch.frequencyMeasure(freq)
        val traj = graft.pipeline.Crunch.hypotheticalTrajectory(s, preds, "2025-06-07")
        val dev = graft.pipeline.Crunch.hypotheticalDeviations(traj, scada)
        graft.pipeline.Crunch.performance(dev, fm)
          // raw doubles, NOT round(,6): per-row arithmetic is bitwise
          // identical across engines, while DuckDB's round() on doubles is
          // approximate near half-ulp (the Registry header rule) — r3's
          // rounds were the one red oracle row in CORRECTNESS_r03
          .select(col("ts"), col("duid"), col("deviation"),
            col("p_lower"), col("p_raise"))
          .orderBy("ts", "duid")
      },
      // same fixture as VALUES literals; EWMA recurrence (state 0.0,
      // e = (1-α)state + αv, α = 2/9) via recursive CTE, 5-min-bucket
      // interpolation evaluated at the scada timestamps (the inner join
      // on ts makes the rest of the 4 s spine unobservable), performance
      // split replicated with the same op order
      Some("""WITH RECURSIVE freq(ts, region, dev) AS (VALUES
                     (TIMESTAMP '2025-06-07 00:00:00', 'NSW1', 0.10::DOUBLE),
                     (TIMESTAMP '2025-06-07 00:00:04', 'NSW1', -0.05::DOUBLE),
                     (TIMESTAMP '2025-06-07 00:00:08', 'NSW1', 0.02::DOUBLE)),
                   fc(iv, poe50) AS (VALUES
                     (TIMESTAMP '2025-06-07 00:00:00', 10.0::DOUBLE),
                     (TIMESTAMP '2025-06-07 00:05:00', 20.0::DOUBLE)),
                   scada(ts, duid, mw) AS (VALUES
                     (TIMESTAMP '2025-06-07 00:00:00', 'D1', 12.0::DOUBLE),
                     (TIMESTAMP '2025-06-07 00:00:04', 'D1', 9.5::DOUBLE),
                     (TIMESTAMP '2025-06-07 00:00:08', 'D1', 10.1::DOUBLE)),
                   b AS (SELECT ts, region, -dev AS v,
                           row_number() OVER (PARTITION BY region ORDER BY ts) AS rn
                         FROM freq),
                   r(region, ts, rn, fm) AS (
                     SELECT region, ts, rn,
                            (1.0::DOUBLE - (2.0::DOUBLE / 9.0::DOUBLE)) * 0.0::DOUBLE
                              + (2.0::DOUBLE / 9.0::DOUBLE) * v
                     FROM b WHERE rn = 1
                     UNION ALL
                     SELECT b.region, b.ts, b.rn,
                            (1.0::DOUBLE - (2.0::DOUBLE / 9.0::DOUBLE)) * r.fm
                              + (2.0::DOUBLE / 9.0::DOUBLE) * b.v
                     FROM r JOIN b ON b.region = r.region AND b.rn = r.rn + 1),
                   t5 AS (SELECT ts, duid, mw,
                            ts - to_milliseconds(epoch_ms(ts) % 300000) AS ts5,
                            CAST(epoch_ms(ts) % 300000 AS DOUBLE) / 300000.0::DOUBLE AS frac
                          FROM scada),
                   traj AS (SELECT t5.ts, t5.duid, t5.mw,
                              coalesce(p.poe50, 0.0::DOUBLE) AS p0,
                              coalesce(n.poe50, p.poe50, 0.0::DOUBLE) AS n0, t5.frac
                            FROM t5
                            LEFT JOIN fc p ON p.iv = t5.ts5
                            LEFT JOIN fc n ON n.iv = t5.ts5 + INTERVAL 5 MINUTE),
                   dev AS (SELECT ts, duid, mw - (p0 + (n0 - p0) * frac) AS deviation
                           FROM traj),
                   perf AS (SELECT d.ts, d.duid, d.deviation, r.fm
                            FROM dev d LEFT JOIN r ON r.ts = d.ts AND r.region = 'NSW1')
              SELECT ts, duid, deviation,
                     (CASE WHEN fm < 0 THEN fm ELSE 0.0::DOUBLE END) * deviation AS p_lower,
                     (CASE WHEN fm > 0 THEN fm ELSE 0.0::DOUBLE END) * deviation AS p_raise
              FROM perf ORDER BY ts, duid""")),


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
              ORDER BY id_a, id_b"""))
  )
}

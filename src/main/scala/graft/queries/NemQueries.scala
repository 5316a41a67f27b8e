package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Ewma, Similarity, TextAnalysis}
import QueryShared._

/** Reference-pipeline (NEM) queries — split/compact roundtrips, the
  * crunch pipeline, settlement, compression study. The multimodal
  * binary-column surface lives in [[MultimodalQueries]].
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
        try {
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
          sizes.toDF("codec", "bytes").orderBy("codec")
        } finally {
          li.unpersist()
          // sizes are already materialized local values — the study dir is
          // pure scratch; leaking it across bench reps litters /tmp (r11 #1)
          graft.sources.NemFixture.deleteRecursively(out)
        }
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
              FROM perf ORDER BY ts, duid"""))
  )
}

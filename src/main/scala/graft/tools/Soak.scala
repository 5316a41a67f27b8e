package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Long-lived-session soak: run the ENTIRE declared query set several
  * times in ONE JVM and report per-pass totals. This is the direct
  * regression harness for the r5 bench-session degradation (untouched
  * trivial queries inflating 3–10× as a 93-query session aged): with the
  * per-query hygiene (catalog cache clear + persistent-RDD sweep),
  * superseded-checkpoint release in connectedComponents, and bounded
  * status-store retention, pass N must cost the same as pass 1.
  *
  * A second stage soaks the STREAMING ingest path: `corpusTicks` ticks
  * of [[graft.streaming.CorpusStream.ingestBatch]] against a growing
  * signature index — per-tick latency and heap must stay flat, proving
  * the targeted per-tick cache release (not a session-wide sweep) and
  * the idempotent-commit bookkeeping don't accumulate anything across
  * thousands of micro-batches. The signature index is compacted every
  * 100 ticks (single rewrite between ticks), modelling the same
  * ingest-loop/compactor split the reference runs — without it the
  * per-tick index LISTING grows linearly with published batch files,
  * which is a filesystem artifact, not session state.
  *
  * A third stage soaks the SEMANTIC ingest loop
  * ([[graft.streaming.SemanticCorpusStream.ingestBatch]]): the same
  * flat-latency/flat-heap gates against a growing cell index (compacted
  * on the same 100-tick cadence), plus a gating-correctness check — each
  * tick plants near-duplicate vectors of the previous tick's docs, so
  * the total novel count over the run is exactly predictable and any
  * index corruption under soak surfaces as a count drift, not just a
  * latency bend.
  *
  * Usage: `runMain graft.tools.Soak [sfDir] [passes] [corpusTicks]
  * [semTicks]` — prints one line per query pass, one line per 100 ingest
  * ticks per loop, and a final PASS/FAIL verdict covering all stages.
  * `passes = 0` skips the query stage; `corpusTicks = 0` / `semTicks =
  * 0` skip the respective ingest stages.
  */
object Soak {

  /** Deterministic ~30-word pseudo-text for tick `t`, doc `i` (LCG over
    * a small vocabulary — unique enough that distinct (t, i) are never
    * near-dups, reproducible so replayed ids are EXACT dups). */
  private def soakText(t: Long, i: Int): String = {
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
      "victor", "whiskey", "xray", "yankee", "zulu")
    var s = t * 100003L + i * 7919L + 12345L
    val words = (0 until 30).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      vocab(((s >>> 33) % vocab.length).toInt)
    }
    s"tick $t doc $i " + words.mkString(" ")
  }

  /** Rewrite `dir` as one parquet file (between ticks — single writer).
    * The swap renames the live dir ASIDE rather than deleting it, so a
    * crash anywhere in the window leaves a recoverable copy — a
    * delete-then-rename swap here would silently lose the whole dedup
    * index on a crash (index read falls back to empty and subsequent
    * ticks re-ingest duplicates as novel). */
  private def compactDir(spark: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + "_old")
    val tmp = new Path(dir + "_compacting")
    // crash recovery: a leftover _old means a prior compaction died
    // mid-swap — if the live dir vanished with it, the _old copy IS the
    // data; if both exist the swap completed and _old is garbage
    if (fs.exists(old)) { if (fs.exists(live)) fs.delete(old, true) else fs.rename(old, live) }
    if (!fs.exists(live)) return
    val df = spark.read.parquet(dir).persist()
    df.count()
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    df.unpersist(blocking = true)
    fs.rename(live, old)   // live copy preserved until the new dir is in place
    fs.rename(tmp, live)
    fs.delete(old, true)
  }

  /** Deterministic 64-dim pseudo-embedding for tick `t`, doc `i` (LCG
    * components in [-1, 1]). 64 dims matter for the soak's EXACT novel
    * count: random-vector cosine concentrates as 1/√dim, so at dim 64
    * the probability any two distinct (t, i) vectors reach the 0.95 gate
    * is ≈ 0 over the whole run — an 8-dim draft version collided ~100
    * times in 300 ticks and broke the count check. */
  private def soakVec(t: Long, i: Int): Array[Double] = {
    var s = t * 104729L + i * 31337L + 271828L
    Array.fill(64) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val corpusTicks = args.lift(2).map(_.toInt).getOrElse(500)
    val semTicks = args.lift(3).map(_.toInt).getOrElse(300)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.attach(spark)
    val rt = Runtime.getRuntime
    val totals = (1 to passes).map { pass =>
      var worst = ("", 0.0)
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (name, fn) =>
        val q0 = System.nanoTime()
        // full-column force, matching Bench (count() would prune the
        // window/generate-heavy queries this soak exists to stress)
        graft.Bench.force(fn(spark, sfDir))
        val dt = (System.nanoTime() - q0) / 1e9
        if (dt > worst._2) worst = (name, dt)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      val total = (System.nanoTime() - t0) / 1e9
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      println(f"[soak] pass $pass/$passes total=$total%.1fs worst=${worst._1}:${worst._2}%.2fs heapMB=$heapMb rdds=${spark.sparkContext.getPersistentRDDs.size}")
      total
    }

    // ---- streaming ingest soak ----
    val tickLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    var heapEarly = 0L
    var heapLate = 0L
    if (corpusTicks > 0) {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_soak_corpus")
      val corpusDir = s"$base/corpus"
      val sigDir = s"$base/sig"
      // stats maintenance ON: the soak must prove the per-tick partial-
      // sketch append doesn't bend the flat-latency/flat-heap curves
      val statsDir = s"$base/stats"
      for (t <- 0 until corpusTicks) {
        // 8 docs per tick: 6 novel + 2 exact replays of the previous
        // tick's docs, so the index probe GATES something every tick
        val docs = (0 until 8).map { i =>
          val id = t.toLong * 8L + i
          val txt = if (i >= 6 && t > 0) soakText(t - 1L, i - 6) else soakText(t.toLong, i)
          (id, txt)
        }.toDF("doc_id", "text")
        val t0 = System.nanoTime()
        graft.streaming.CorpusStream.ingestBatch(spark, docs, "doc_id", "text",
          corpusDir, sigDir, shingleLen = 3, numHashes = 16, bands = 4,
          minAgree = 0.8, batchId = Some(t.toLong),
          statsDir = Some(statsDir), statsDepth = 4, statsWidth = 64)
        tickLat += (System.nanoTime() - t0) / 1e9
        if ((t + 1) % 100 == 0) {
          compactDir(spark, sigDir)
          // stats partials compact on the same cadence, one sublayout at
          // a time (cm: add-mergeable counts, hll: max-mergeable
          // registers — both fold-preserving under a plain rewrite);
          // without it the per-tick dir LISTING grows one file per batch
          // (same filesystem artifact the sig compaction exists for)
          compactDir(spark, s"$statsDir/cm")
          compactDir(spark, s"$statsDir/hll")
          System.gc()
          val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
          if (t + 1 == 100) heapEarly = heapMb
          heapLate = heapMb
          val last100 = tickLat.takeRight(100)
          println(f"[soak] ticks ${t + 1}/$corpusTicks median=${median(last100.toSeq)}%.2fs max=${last100.max}%.2fs heapMB=$heapMb rdds=${spark.sparkContext.getPersistentRDDs.size}")
        }
      }
      // the accumulated partials must still fold to one fixed-grid sketch
      // and a readable cardinality row
      val statCells = graft.streaming.CorpusStream.readTokenStats(spark, statsDir).count()
      val card = graft.streaming.CorpusStream.readTokenCardinality(spark, statsDir)
        .collect().head
      println(s"[soak] folded stats cells=$statCells (grid 4x64) " +
        f"distinct_est=${card.getAs[Double]("est_raw")}%.0f")
    }

    // ---- semantic ingest soak ----
    val semLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    var semHeapEarly = 0L
    var semHeapLate = 0L
    var semNovelTotal = 0L
    if (semTicks > 0) {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_soak_sem")
      val corpusDir = s"$base/corpus"
      val idxDir = s"$base/idx"
      // 4 fixed unit-ish centroids: enough cells that the index probe
      // prunes, few enough that every cell keeps filling for the whole run
      val centroids = (0 until 4).map(c => soakVec(-1L - c, 0)).toSeq
      for (t <- 0 until semTicks) {
        // 8 docs per tick: 6 novel vectors + 2 EXACT vector replays of the
        // previous tick's docs under fresh ids — the cell-index probe must
        // gate those 2 out every tick (cosine 1 ≥ minCosine)
        val docs = (0 until 8).map { i =>
          val id = t.toLong * 8L + i
          val vec = if (i >= 6 && t > 0) soakVec(t - 1L, i - 6) else soakVec(t.toLong, i)
          (id, vec)
        }.toDF("doc_id", "embedding")
        val t0 = System.nanoTime()
        semNovelTotal += graft.streaming.SemanticCorpusStream.ingestBatch(
          spark, docs, "doc_id", "embedding", corpusDir, idxDir,
          centroids, minCosine = 0.95, nprobe = 2, batchId = Some(t.toLong))
        semLat += (System.nanoTime() - t0) / 1e9
        if ((t + 1) % 100 == 0) {
          compactDir(spark, idxDir)
          System.gc()
          val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
          if (t + 1 == 100) semHeapEarly = heapMb
          semHeapLate = heapMb
          val last100 = semLat.takeRight(100)
          println(f"[soak-sem] ticks ${t + 1}/$semTicks median=${median(last100.toSeq)}%.2fs max=${last100.max}%.2fs heapMB=$heapMb rdds=${spark.sparkContext.getPersistentRDDs.size}")
        }
      }
    }
    spark.stop()

    // pass 1 pays janino compilation for every generated stage; steady
    // state is pass 2+. Degradation = any later pass markedly worse than
    // pass 2 (1.5× leaves room for box noise; r5's signature was 2-10×).
    val steady = totals.drop(1)
    val queryOk = steady.isEmpty || steady.max <= steady.min * 1.5
    // ingest: same shape — first 100 ticks pay codegen; steady per-tick
    // median must not creep (1.5× slack) and post-GC heap must stay flat
    val (corpusOk, tickSummary) =
      if (tickLat.size < 200) (true, f"ticks=${tickLat.size}")
      else {
        val early = median(tickLat.slice(100, 200).toSeq)
        val late = median(tickLat.takeRight(100).toSeq)
        val flatLat = late <= early * 1.5
        // ratio slack plus an absolute floor: post-GC heap in a 100+ GiB
        // JVM wobbles by hundreds of MB from GC timing alone, so a low
        // tick-100 baseline must not turn plateau noise into a FAIL — a
        // real per-tick leak across 400 ticks shows up in GBs, far above
        // both bounds
        val flatHeap = heapEarly == 0L ||
          heapLate <= math.max(heapEarly * 2, heapEarly + 512)
        (flatLat && flatHeap,
          f"ticks=${tickLat.size} early=$early%.2fs late=$late%.2fs heapMB=$heapEarly->$heapLate")
      }
    // semantic loop: same latency/heap gates, PLUS the exact novel-count
    // check — 8 docs tick 0, then 6 novel per tick (2 planted replays
    // gated by the index); any drift means the index lost or duplicated
    // rows somewhere across ticks/compactions
    val (semOk, semSummary) =
      if (semLat.isEmpty) (true, "sem=skipped")
      else {
        val expected = 8L + (semLat.size - 1).toLong * 6L
        val countOk = semNovelTotal == expected
        val flat =
          if (semLat.size < 200) true
          else {
            val early = median(semLat.slice(100, 200).toSeq)
            val late = median(semLat.takeRight(100).toSeq)
            late <= early * 1.5
          }
        val heapOk = semHeapEarly == 0L ||
          semHeapLate <= math.max(semHeapEarly * 2, semHeapEarly + 512)
        (countOk && flat && heapOk,
          s"sem_ticks=${semLat.size} sem_novel=$semNovelTotal/$expected " +
            f"sem_heapMB=$semHeapEarly->$semHeapLate")
      }
    val verdict = if (queryOk && corpusOk && semOk) "SOAK PASS" else "SOAK FAIL"
    val passSummary =
      if (totals.isEmpty) "passes=skipped"
      else s"passes=${totals.map(t => f"$t%.1f").mkString(",")}s"
    println(s"$verdict: $passSummary $tickSummary $semSummary")
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }
}

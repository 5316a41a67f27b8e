package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.operators.Dedup

/** Streaming corpus ingestion with near-dup gating — the per-arrival
  * composition the batch operators were shaped for: each micro-batch
  *
  *  1. drops exact duplicates WITHIN the batch ([[Dedup.exactDedup]]
  *     over the non-null-text rows; null-text docs have no content
  *     identity, so they dedup by id only and never collapse with each
  *     other — the same null-never-matches rule as
  *     [[Dedup.incrementalDedup]]);
  *  2. probes the accumulated minhash signature index for near-dups of
  *     anything already ingested ([[Dedup.incrementalNearDup]] — batch
  *     side broadcasts, the index is scanned, never shuffled);
  *  3. appends only the novel docs to the corpus, and their signatures
  *     to the index, so the next batch probes an up-to-date index;
  *  4. (optional, `statsDir`) appends the novel docs' PARTIAL count-min
  *     sketch — streaming statistics maintenance: corpus-wide token
  *     frequencies stay queryable ([[readTokenStats]]) at the cost of
  *     one fixed-grid aggregation per tick, no corpus rescan ever.
  *
  * The index is a plain parquet table of [[Dedup.minhashSignature]]
  * rows — the materialization [[Dedup.bandIndex]] derives from, and the
  * thing a 100 TB pipeline maintains INSTEAD of re-banding the corpus
  * per arrival. Near-dups WITHIN a micro-batch are deliberately not
  * chased (batch-local LSH on a trigger's worth of docs buys little and
  * costs a self-join per tick); run the batch near-dup pass over the
  * corpus on compaction cadence instead — the same split the reference
  * uses between its ingest loop and its compactor.
  *
  * == Delivery: exactly-once at batch granularity ==
  *
  * foreachBatch is at-least-once, and the tick writes TWO tables (three
  * with `statsDir`, all under the same protocol) — so a
  * naive append pair leaves a crashed-and-replayed batch half-committed
  * (docs in the corpus invisible to the index, or re-appended twice).
  * [[ingestBatch]] instead commits idempotently on the foreachBatch
  * `batchId`:
  *
  *  - every batch's files publish under deterministic batch-prefixed
  *    names (`batch<id>-part-…`), staged in a hidden `_tmp` dir first;
  *  - a replay of a FULLY committed batch (its marker file under
  *    `<corpusDir>/_graft_commits/` exists) is skipped outright;
  *  - a replay of a PARTIALLY published batch first deletes that batch's
  *    files from BOTH tables (rolling the tables back to the pre-batch
  *    state — critical: without the rollback, the batch's own orphaned
  *    index rows would flag its docs as dups and the docs would be lost),
  *    then recomputes and republishes; the dedup pipeline is
  *    deterministic, so the republish is byte-equivalent;
  *  - the commit marker is a single atomic file create, written last.
  *
  * Remaining window (documented, not hidden): a concurrent reader
  * between the two publishes can see a doc in the corpus whose signature
  * is not yet in the index — bounded by one tick and healed by the
  * commit; the writer side is single-daemon by contract.
  */
object CorpusStream {

  def start(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, corpusDir: String, sigDir: String,
      checkpointDir: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minAgree: Double = 0.8,
      statsDir: Option[String] = None,
      statsDepth: Int = 4, statsWidth: Int = 512,
      statsHllP: Int = 12): StreamingQuery = {
    // explicit Unit-typed function pins the Scala overload of
    // foreachBatch (the Java VoidFunction2 alternative makes an inline
    // lambda ambiguous)
    val tick: (DataFrame, Long) => Unit = (batch, batchId) => {
      ingestBatch(spark, batch, idCol, textCol, corpusDir, sigDir,
        shingleLen, numHashes, bands, minAgree, batchId = Some(batchId),
        statsDir = statsDir, statsDepth = statsDepth, statsWidth = statsWidth,
        statsHllP = statsHllP)
      ()
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(tick)
      .start()
  }

  /** Fold the accumulated per-batch partial sketches into the
    * whole-corpus count-min sketch — the read side of streaming
    * statistics maintenance (`statsDir` on [[start]]/[[ingestBatch]]):
    * the stream pays one fixed-grid aggregation per tick; readers fold
    * `ticks × depth·width` partial rows and never rescan the corpus.
    * Identical to sketching the corpus directly (lossless add-merge —
    * the `ta_cm_merge` property), which StreamingSpec asserts.
    * Layout: `statsDir/cm` holds the count-min partials, `statsDir/hll`
    * the HLL register partials ([[readTokenCardinality]]). */
  def readTokenStats(spark: SparkSession, statsDir: String): DataFrame =
    graft.operators.TextSketches.cmMerge(Seq(spark.read.parquet(s"$statsDir/cm")))

  /** Distinct-token cardinality from the accumulated HLL register
    * partials — the companion read to [[readTokenStats]]: registers
    * merge by per-bucket max ([[graft.operators.TextSketches.hllMerge]]
    * — max is associative AND idempotent, so a replayed tick's partial
    * cannot inflate the fold the way a replayed count row would), and
    * the one-row summary carries the exact register state (m, v_zero,
    * denom) plus the raw HLL estimate — same estimator surface as the
    * `ta_hll_distinct` query. Cost: `ticks × 2^p` register rows folded;
    * the corpus is never rescanned. */
  def readTokenCardinality(spark: SparkSession, statsDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // mergeSchema: the p-stamp check must see EVERY partial's schema —
    // the default single-footer sample could miss the p column entirely
    // when stamped and pre-stamp files coexist (footers here are
    // tick-count-bounded, so the extra reads are noise)
    val raw = spark.read.option("mergeSchema", "true").parquet(s"$statsDir/hll")
    // partials are stamped with the p they were written at (ingestBatch):
    // a max-merge across DIFFERENT p values is silently wrong even when
    // the merged bucket count happens to be a power of two (a dense
    // p=4 grid unioned with a dense p=5 grid is just the p=5 grid), so
    // the stamp — not the fold shape — is the authoritative check
    val (ps: Seq[Int], anyUnstamped: Boolean) =
      if (raw.columns.contains("p")) {
        // rows from pre-stamp files surface p as null under parquet
        // schema merge — treat those as unstamped, don't NPE on getInt
        val d = raw.select("p").distinct().collect()
        (d.flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).sorted.toSeq,
          d.exists(_.isNullAt(0)))
      } else (Seq.empty[Int], false)
    require(ps.lengthCompare(1) <= 0 && !(anyUnstamped && ps.nonEmpty),
      s"HLL partials under $statsDir/hll were written with mixed " +
        s"statsHllP values ${ps.mkString(", ")}" +
        (if (anyUnstamped) " plus unstamped partials" else "") +
        " and cannot be max-merged; rebuild the stats with one p")
    val regs = graft.operators.TextSketches.hllMerge(Seq(raw))
    val m = regs.count() // 2^p, densified by hllRegisters' spine join
    // second line of defense, for unstamped/corrupt partials: the fold
    // must cover a full 2^p bucket grid or numberOfTrailingZeros would
    // derive a silently-wrong exponent
    require(m > 0 && (m & (m - 1)) == 0,
      s"HLL register fold has $m buckets — not a full power-of-two " +
        "grid; the partials under this statsDir are truncated or corrupt")
    ps.headOption.foreach(p0 => require(m == (1L << p0),
      s"HLL register fold has $m buckets but partials declare p=$p0 " +
        s"(expected ${1L << p0}); the partials are truncated or corrupt"))
    val p = java.lang.Long.numberOfTrailingZeros(m)
    // scale exponent x = 62−p: keeps the all-zero-register worst case
    // (denom = m·2^x = 2^62) inside BIGINT for any p, and x − max rho =
    // 62−p − (61−p) = 1 > 0 so every shift is non-negative
    val x = 62 - p
    regs.agg(
        count(lit(1)).as("m"),
        sum(when(col("rho") === 0, 1L).otherwise(0L)).as("v_zero"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $x - rho)")).as("denom"))
      .withColumn("est_raw",
        lit(0.7213 / (1.0 + 1.079 / m)) * lit(m.toDouble * m.toDouble) *
          lit(math.pow(2.0, x)) / col("denom").cast("double"))
  }

  // commit-protocol primitives live in [[BatchCommit]] (shared with the
  // embedding-gated [[SemanticCorpusStream]])
  import BatchCommit.{commitMarker, publish, rollback}

  /** One tick of the ingest loop (factored out so batch jobs and tests
    * can drive it directly). Returns the number of novel docs kept.
    *
    * `batchId = Some(id)` (what [[start]] always passes) turns on the
    * idempotent-commit protocol documented on the object; `None` is the
    * plain-append path for ad-hoc batch use, with no replay protection.
    *
    * Per-tick cost and hygiene: the batch is shingled and minhashed
    * exactly ONCE (`batchSig` feeds the index probe, the verify pass AND
    * the signature append via a semi-join — not a second tokenization),
    * and the tick ends by releasing exactly ITS OWN persists — the batch
    * signatures, the novel-docs frame, and the operator-internal shingle
    * postings (tracked via [[Dedup.minhashSignatureWithPosts]]). Cached
    * work co-resident in the session survives a tick untouched (the r6
    * design swept the whole session cache instead, silently destroying
    * any co-resident cached frames). */
  def ingestBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, corpusDir: String, sigDir: String,
      shingleLen: Int, numHashes: Int, bands: Int,
      minAgree: Double, batchId: Option[Long] = None,
      statsDir: Option[String] = None,
      statsDepth: Int = 4, statsWidth: Int = 512,
      statsHllP: Int = 12): Long = {
    if (batch.isEmpty) return 0L
    val conf = spark.sparkContext.hadoopConfiguration
    // this FS serves only the commit marker, which lives under corpusDir;
    // rollback/publish resolve a FileSystem per target dir
    val fs = new Path(corpusDir).getFileSystem(conf)
    batchId.foreach { bid =>
      if (fs.exists(commitMarker(corpusDir, bid))) return 0L // committed replay
      // partial-publish rollback BEFORE the index probe: the batch's own
      // orphaned signature rows would otherwise gate its docs out
      rollback(conf, sigDir, bid)
      rollback(conf, corpusDir, bid)
      statsDir.foreach { sd =>
        rollback(conf, s"$sd/cm", bid)
        rollback(conf, s"$sd/hll", bid)
      }
    }
    // null-text docs carry no content identity: keep one row per id
    // (never collapse distinct docs on a shared null hash) and skip the
    // signature machinery — they pass to the corpus for review but never
    // enter the index
    val deduped = Dedup.exactDedup(batch.filter(col(textCol).isNotNull), idCol, textCol)
      .unionByName(batch.filter(col(textCol).isNull).dropDuplicates(idCol))
    val (batchSig0, posts) = Dedup.minhashSignatureWithPosts(
      deduped, idCol, textCol, shingleLen, numHashes)
    val batchSig = batchSig0.persist()
    val index = try Some(spark.read.parquet(sigDir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val novel = (index match {
      case Some(sig) =>
        val dupIds = Dedup.incrementalNearDupFromSig(batchSig, sig, idCol,
            numHashes, bands, minAgree)
          .select(col("batch_id").as(idCol)).distinct()
        deduped.join(dupIds, Seq(idCol), "left_anti")
      case None => deduped
    // cache: novel feeds the corpus append, the signature append and
    // the count; without it the index probe would run three times
    }).persist()
    try {
      val n = novel.count()
      if (n > 0) {
        val novelSig = batchSig.join(novel.select(col(idCol)), Seq(idCol), "left_semi")
        // streaming statistics maintenance: each tick appends the NOVEL
        // docs' partial count-min sketch AND HLL register partial (both
        // fixed-grid, corpus-size-independent) under the same batch-
        // prefixed commit protocol — readers fold partials
        // ([[readTokenStats]]/[[readTokenCardinality]]) and never rescan
        // the corpus. HLL merge is idempotent max, so even a re-published
        // partial could never inflate the cardinality.
        val batchStats = statsDir.map { sd =>
          val toks = novel.select(explode(split(
            graft.operators.TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
            .filter(length(col("tok")) > 0)
          (sd,
            graft.operators.TextSketches.countMinSketch(novel, textCol,
              statsDepth, statsWidth),
            // stamp the partial with its p: readTokenCardinality refuses
            // to max-merge partials written at different statsHllP
            graft.operators.TextSketches.hllRegisters(toks, col("tok"), statsHllP)
              .withColumn("p", lit(statsHllP)))
        }
        batchId match {
          case Some(bid) =>
            publish(conf, novel, corpusDir, bid)
            publish(conf, novelSig, sigDir, bid)
            batchStats.foreach { case (sd, cm, hll) =>
              publish(conf, cm, s"$sd/cm", bid)
              publish(conf, hll, s"$sd/hll", bid)
            }
          case None =>
            novel.write.mode("append").parquet(corpusDir)
            novelSig.write.mode("append").parquet(sigDir)
            batchStats.foreach { case (sd, cm, hll) =>
              cm.write.mode("append").parquet(s"$sd/cm")
              hll.write.mode("append").parquet(s"$sd/hll")
            }
        }
      }
      batchId.foreach { bid =>
        val marker = commitMarker(corpusDir, bid)
        fs.mkdirs(marker.getParent)
        fs.createNewFile(marker) // atomic create = the commit point
      }
      n
    } finally {
      // release exactly this tick's persists; co-resident session caches
      // are untouched
      novel.unpersist(blocking = false)
      batchSig.unpersist(blocking = false)
      posts.unpersist(blocking = false)
    }
  }
}

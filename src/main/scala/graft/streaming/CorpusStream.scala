package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Streaming corpus ingestion with near-dup gating — the per-arrival
  * composition the batch operators were shaped for: each micro-batch
  *
  *  1. drops exact duplicates WITHIN the batch ([[Dedup.exactDedup]]);
  *  2. probes the accumulated minhash signature index for near-dups of
  *     anything already ingested ([[Dedup.incrementalNearDup]] — batch
  *     side broadcasts, the index is scanned, never shuffled);
  *  3. appends only the novel docs to the corpus, and their signatures
  *     to the index, so the next batch probes an up-to-date index.
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
  * Delivery note: foreachBatch is at-least-once — a crashed-and-replayed
  * batch can append twice. The reference's answer (history-table skip,
  * [[IngestStream]]) applies unchanged upstream of this sink; inside it,
  * replayed doc ids are also caught by the index probe itself for
  * near-identical content (agreement 1.0). */
object CorpusStream {

  def start(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, corpusDir: String, sigDir: String,
      checkpointDir: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minAgree: Double = 0.8): StreamingQuery = {
    // explicit Unit-typed function pins the Scala overload of
    // foreachBatch (the Java VoidFunction2 alternative makes an inline
    // lambda ambiguous)
    val tick: (DataFrame, Long) => Unit = (batch, _) => {
      ingestBatch(spark, batch, idCol, textCol, corpusDir, sigDir,
        shingleLen, numHashes, bands, minAgree)
      ()
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(tick)
      .start()
  }

  /** One tick of the ingest loop (factored out so batch jobs and tests
    * can drive it directly). Returns the number of novel docs kept.
    *
    * Per-tick cost and hygiene: the batch is shingled and minhashed
    * exactly ONCE (`batchSig` feeds the index probe, the verify pass AND
    * the signature append via a semi-join — not a second tokenization),
    * and the tick ends with a full cache sweep: the dedup operators
    * persist shared subplans (batch signatures, shingle postings) that a
    * long-lived streaming session would otherwise accumulate across
    * thousands of micro-batches — the same per-unit-of-work sweep
    * Bench/Verify run per query. The session is assumed dedicated to
    * the loop (a daemon's is); callers sharing a session with other
    * cached work should persist that work externally. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, corpusDir: String, sigDir: String,
      shingleLen: Int, numHashes: Int, bands: Int,
      minAgree: Double): Long = {
    if (batch.isEmpty) return 0L
    try {
      val deduped = Dedup.exactDedup(batch, idCol, textCol)
      val batchSig = Dedup.minhashSignature(deduped, idCol, textCol,
          shingleLen, numHashes)
        .persist()
      val index = try Some(spark.read.parquet(sigDir))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      // anti-join on `deduped` (not batchSig ids): a null-text doc has no
      // signature row, but it is still a batch row — it passes through to
      // the corpus (review case), it just never enters the index
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
      val n = novel.count()
      if (n > 0) {
        novel.write.mode("append").parquet(corpusDir)
        batchSig.join(novel.select(col(idCol)), Seq(idCol), "left_semi")
          .write.mode("append").parquet(sigDir)
      }
      n
    } finally {
      // release EVERYTHING the tick persisted, incl. operator-internal
      // caches (shingle postings) that are invisible to the caller
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }
}

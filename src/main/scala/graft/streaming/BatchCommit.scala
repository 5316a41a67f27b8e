package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The idempotent per-batch commit protocol shared by the ingest loops
  * ([[CorpusStream]] minhash-gated, [[SemanticCorpusStream]]
  * embedding-gated): batch-prefixed deterministic file names staged
  * under a hidden tmp dir, rollback of partially-published batches, and
  * an atomic marker file as the commit point. See [[CorpusStream]]'s
  * object doc for the full exactly-once-at-batch-granularity argument —
  * the protocol is table-agnostic, which is why it lives here. */
private[streaming] object BatchCommit {

  def commitMarker(corpusDir: String, batchId: Long): Path =
    new Path(new Path(corpusDir, "_graft_commits"), s"batch-$batchId")

  /** Delete any published files of `batchId` from `dir` (partial-publish
    * rollback) — batch-prefixed names make them identifiable. Resolves
    * its own FileSystem from `dir`: target dirs may live on different
    * schemes, and probing one dir through another's FS makes the
    * rollback a silent no-op (exists=false on the wrong FS). */
  def rollback(conf: Configuration, dir: String, batchId: Long): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d))
      fs.listStatus(d).filter(_.getPath.getName.startsWith(s"batch$batchId-"))
        .foreach(s => fs.delete(s.getPath, false))
  }

  /** Stage `df` under a hidden tmp dir, then move its part files into
    * `dir` under deterministic `batch<id>-` names. Underscore-prefixed
    * staging dirs are invisible to parquet readers mid-write; the moves
    * land whole files, and a replay deletes stale names first
    * ([[rollback]]), so readers never see a duplicate. */
  def publish(conf: Configuration, df: DataFrame, dir: String,
      batchId: Long): Unit = {
    val fs = new Path(dir).getFileSystem(conf) // per-dir FS, same reason as rollback
    val tmp = new Path(dir, s"_tmp_batch_$batchId")
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        val dest = new Path(dir, s"batch$batchId-${s.getPath.getName}")
        // rename failure must fail the TICK, not silently drop part files
        // from a batch the caller is about to mark committed — throwing
        // here leaves no marker, so the replay path rolls the partial
        // publish back and retries the whole batch
        if (!fs.rename(s.getPath, dest))
          throw new java.io.IOException(
            s"batch $batchId publish: rename ${s.getPath} -> $dest failed")
      }
    fs.delete(tmp, true)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Append-only parquet-backed history/dedup table, generic over row shape —
  * the reference's `TableHistory` (/root/reference/src/history/
  * table_history.rs:48-186): `add` appends one small file per event,
  * `keys` lists the seen key column, `vacuum` consolidates the small files
  * into one and deletes them (keys must survive re-open:
  * table_history.rs:188-275), and idempotency checks are `left_anti`
  * joins instead of the reference's in-memory HashSet.
  */
final class HistoryTable(spark: SparkSession, dir: String, keyCol: String) {

  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hasData: Boolean = {
    val p = new Path(dir)
    fs.exists(p) && fs.listStatus(p).exists(s => s.getPath.getName.endsWith(".parquet"))
  }

  /** Append one event row (single small parquet file, like `add()` at
    * table_history.rs:106-134 — one file per event, vacuumed later). */
  def add(row: DataFrame): Unit =
    row.coalesce(1).write.mode("append").parquet(dir)

  /** All rows (empty frame with no schema knowledge → caller handles). */
  def all(): Option[DataFrame] =
    if (hasData) Some(spark.read.parquet(dir)) else None

  /** Distinct seen keys. */
  def keys(): Option[DataFrame] =
    all().map(_.select(keyCol).distinct())

  /** Total parquet bytes in the history dir — one directory listing, the
    * same metadata `hasData` already reads; no footer opens, no scan. */
  private def totalBytes: Long = {
    val p = new Path(dir)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  /** Above this on-disk size the anti-join flips from broadcast to
    * shuffle. 64 MB of parquet ≫ what a driver-broadcast key set should
    * ever be (keys are file names; this history is millions of rows
    * before the limit trips). */
  private val BroadcastByteLimit = 64L * 1024 * 1024

  /** Candidates whose `candKey` has NOT been seen — the idempotent-work
    * filter (reference main.rs:177-179,248-250). Broadcast-anti while the
    * history is small (file-name cardinality — the normal case, decided
    * from one dir listing); a huge history falls back to a shuffle
    * anti-join instead of OOMing the driver. */
  def filterNew(candidates: DataFrame, candKey: String): DataFrame =
    keys() match {
      case None => candidates
      case Some(k) if totalBytes <= BroadcastByteLimit =>
        candidates.join(broadcast(k), candidates(candKey) === k(keyCol), "left_anti")
      case Some(k) =>
        candidates.join(k, candidates(candKey) === k(keyCol), "left_anti")
    }

  /** Consolidate all files into one `consolidated-<n>.parquet`, delete the
    * inputs (table_history.rs:143-185). Safe to call repeatedly. */
  def vacuum(): Unit = if (hasData) {
    val inputs = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    if (inputs.length > 1) {
      val df = spark.read.parquet(dir).cache()
      df.count() // materialize before deleting sources
      val tmp = new Path(dir, ".vacuum_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      df.unpersist()
      val part = fs.listStatus(tmp).map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dst = new Path(dir, s"consolidated-${System.currentTimeMillis()}.parquet")
      // publish FIRST, then delete inputs: a crash in between leaves
      // duplicate keys (harmless — filterNew is a distinct-key anti-join)
      // instead of losing the whole history (keys must survive re-open,
      // table_history.rs:188-275)
      fs.rename(part, dst)
      inputs.foreach(p => fs.delete(p, false))
      fs.delete(tmp, true)
      // clean write-metadata clutter
      fs.listStatus(new Path(dir)).map(_.getPath)
        .filter(p => p.getName.startsWith("_") || p.getName.startsWith("."))
        .foreach(p => fs.delete(p, true))
    }
  }
}

object HistoryTable {
  /** The three concrete histories of the reference (downloaded.rs /
    * processed.rs / compacted.rs), keyed by filename/path. */
  def downloaded(spark: SparkSession, root: String) = new HistoryTable(spark, s"$root/downloaded", "filename")
  def processed(spark: SparkSession, root: String) = new HistoryTable(spark, s"$root/processed", "filename")
  def compacted(spark: SparkSession, root: String) = new HistoryTable(spark, s"$root/compacted", "path")
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.sources.HistoryTable

/** Partition compactor: merge the many small per-ingest parquet files of
  * each `<table>/date=D/` partition into one `compacted.parquet`, with
  * schema evolution, atomic publication and anti-join bookkeeping —
  * the reference's compactor binary
  * (/root/reference/src/bin/compactor.rs:33-111,584-792).
  *
  * Scale: each partition is one independent unit of work; on a cluster
  * the per-partition jobs are scheduled concurrently (the reference used a
  * rayon scope + per-partition mutex; Spark's scheduler + disjoint output
  * paths make the lock unnecessary). A single partition's rewrite streams
  * through `coalesce(1)` — no full materialization.
  */
object Compactor {

  final case class Stat(table: String, partition: String, inputFiles: Int, rows: Long)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All `<table>/date=...` partition dirs under the lake root. */
  def discoverPartitions(spark: SparkSession, lakeRoot: String): Seq[(String, String)] = {
    val f = fs(spark, lakeRoot)
    val root = new Path(lakeRoot)
    if (!f.exists(root)) return Seq.empty
    for {
      t <- f.listStatus(root).toSeq if t.isDirectory
      p <- f.listStatus(t.getPath).toSeq
      if p.isDirectory && p.getPath.getName.startsWith("date=")
    } yield (t.getPath.getName, p.getPath.getName)
  }

  /** Compact one partition dir: read every non-compacted parquet file under
    * the widened schema, rewrite as a single `compacted.parquet`
    * (tmp + rename, compactor.rs:644-755), delete inputs. Returns None if
    * there was nothing to do. */
  def compactPartition(spark: SparkSession, lakeRoot: String, table: String,
      partition: String, compression: String = "zstd"): Option[Stat] = {
    val dir = s"$lakeRoot/$table/$partition"
    val f = fs(spark, dir)
    val inputs = f.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && p.getName != "compacted.parquet")
    val existing = new Path(dir, "compacted.parquet")
    val sources = (inputs ++ (if (f.exists(existing)) Seq(existing) else Seq.empty)).map(_.toString)
    if (inputs.isEmpty) return None
    val merged = SchemaEvolution.readWidened(spark, sources.toIndexedSeq)
    val tmp = new Path(dir, ".compact_tmp")
    merged.coalesce(1).write.mode("overwrite")
      .option("compression", compression).parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    val part = f.listStatus(tmp).map(_.getPath).find(_.getName.endsWith(".parquet")).get
    // atomic publish: delete inputs, rename tmp part into place
    inputs.foreach(p => f.delete(p, false))
    if (f.exists(existing)) f.delete(existing, false)
    f.rename(part, existing)
    f.delete(tmp, true)
    f.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .foreach(p => f.delete(p, true))
    Some(Stat(table, partition, inputs.length, rows))
  }

  /** One compaction sweep: for every partition containing files not yet in
    * the `compacted` history, rewrite and record. The anti-join is the
    * idempotency gate (compactor.rs:597-641). */
  def runOnce(spark: SparkSession, lakeRoot: String, history: HistoryTable): Seq[Stat] = {
    import spark.implicits._
    val parts = discoverPartitions(spark, lakeRoot)
    val f = fs(spark, lakeRoot)
    val candidates = parts.flatMap { case (t, p) =>
      f.listStatus(new Path(s"$lakeRoot/$t/$p")).map(_.getPath)
        .filter(x => x.getName.endsWith(".parquet") && x.getName != "compacted.parquet")
        .map(x => (t, p, s"$t/$p/${x.getName}"))
    }
    if (candidates.isEmpty) return Seq.empty
    val cands = candidates.toDF("table", "partition", "path")
    val fresh = history.filterNew(cands, "path")
    val dirty = fresh.select("table", "partition").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val freshPaths = fresh.select("path").as[String].collect()
    val stats = dirty.toIndexedSeq.flatMap { case (t, p) =>
      compactPartition(spark, lakeRoot, t, p)
    }
    if (freshPaths.nonEmpty) {
      val now = new java.sql.Timestamp(System.currentTimeMillis())
      history.add(freshPaths.toIndexedSeq.toDF("path")
        .withColumn("compacted_at", lit(now)))
    }
    stats
  }
}

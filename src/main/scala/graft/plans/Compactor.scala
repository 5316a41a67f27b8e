package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.sources.{HistoryTable, ParquetMeta}

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

  private val NewFile = ".compact_new.parquet"
  private val Manifest = ".compact_manifest"

  /** Crash recovery for [[compactPartition]]'s publish protocol. States:
    *  - `.compact_new.parquet` without manifest: merge result existed but
    *    nothing was deleted yet → discard it (inputs are intact);
    *  - manifest present: the files it lists were merged into the new
    *    file → finish the deletes; if the new file is still hidden,
    *    promote it to `compacted.parquet` (when the manifest lists
    *    `compacted.parquet` but the new file was already promoted, the
    *    listed name IS the merged data — never delete it then). */
  private def recover(f: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val newP = new Path(dir, NewFile)
    val manP = new Path(dir, Manifest)
    if (f.exists(manP)) {
      val in = f.open(manP)
      val listed = scala.io.Source.fromInputStream(in).getLines().toVector
      in.close()
      val newExists = f.exists(newP)
      listed.foreach { name =>
        if (newExists || name != "compacted.parquet") {
          val p = new Path(dir, name)
          if (f.exists(p)) f.delete(p, false)
        }
      }
      if (newExists) f.rename(newP, new Path(dir, "compacted.parquet"))
      f.delete(manP, false)
    } else if (f.exists(newP)) {
      f.delete(newP, false)
    }
  }

  /** Compact one partition dir: read every non-compacted parquet file under
    * the widened schema, rewrite as a single `compacted.parquet`, delete
    * inputs. Publish protocol (crash-safe refinement of the reference's
    * tmp+rename, compactor.rs:644-755): merge → hidden new file →
    * manifest of merged names → deletes → promote → drop manifest; a crash
    * at any point is repaired by [[recover]] on the next sweep. Returns
    * None if there was nothing to do. */
  def compactPartition(spark: SparkSession, lakeRoot: String, table: String,
      partition: String, compression: String = "zstd"): Option[Stat] = {
    val dir = s"$lakeRoot/$table/$partition"
    val f = fs(spark, dir)
    recover(f, dir)
    val inputs = f.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && p.getName != "compacted.parquet")
    val existing = new Path(dir, "compacted.parquet")
    val hadExisting = f.exists(existing)
    val sources = (inputs ++ (if (hadExisting) Seq(existing) else Seq.empty)).map(_.toString)
    if (inputs.isEmpty) return None
    val merged = SchemaEvolution.readWidened(spark, sources.toIndexedSeq)
    val tmp = new Path(dir, ".compact_tmp")
    merged.coalesce(1).write.mode("overwrite")
      .option("compression", compression).parquet(tmp.toString)
    val part = f.listStatus(tmp).map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val rows = ParquetMeta.read(spark, part.toString).rows // footer, not a re-scan
    val newP = new Path(dir, NewFile)
    f.rename(part, newP)
    val manifest = inputs.map(_.getName) ++ (if (hadExisting) Seq("compacted.parquet") else Nil)
    val out = f.create(new Path(dir, Manifest), true)
    out.write(manifest.mkString("\n").getBytes("UTF-8")); out.close()
    inputs.foreach(p => f.delete(p, false))
    if (f.exists(existing)) f.delete(existing, false)
    f.rename(newP, existing)
    f.delete(new Path(dir, Manifest), false)
    f.delete(tmp, true)
    f.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.startsWith("_") || (p.getName.startsWith(".") && p.getName != NewFile && p.getName != Manifest))
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
    // fan the per-partition rewrites out concurrently (the reference's
    // rayon scope, compactor.rs:76-94): output dirs are disjoint and the
    // manifest protocol is per-dir, so no lock is needed. Each job is a
    // single coalesce(1) task — concurrency is what keeps >1 core busy.
    val stats = graft.Par.mapBounded(dirty.toIndexedSeq) { case (t, p) =>
      compactPartition(spark, lakeRoot, t, p)
    }
    if (freshPaths.nonEmpty) {
      val now = new java.sql.Timestamp(System.currentTimeMillis())
      history.add(freshPaths.toIndexedSeq.toDF("path")
        .withColumn("compacted_at", lit(now)))
    }
    stats
  }

  /** Continuous compactor — the reference's compactor binary loop:
    * a compaction sweep every `intervalMillis` (5 min,
    * compactor.rs:108-110) and a history vacuum every
    * `vacuumIntervalMillis` (30 s, table_history.rs:95-103), on one
    * driver loop with graceful stop ([[graft.DaemonControl]]). A failed
    * sweep logs and the loop continues. Blocking; returns the stats of
    * completed sweeps (bounded by `maxSweeps`). */
  def runLoop(spark: SparkSession, lakeRoot: String, history: HistoryTable,
      intervalMillis: Long = 300000L, vacuumIntervalMillis: Long = 30000L,
      maxSweeps: Long = Long.MaxValue,
      control: graft.DaemonControl = new graft.DaemonControl,
      installShutdownHook: Boolean = true,
      onSweep: Seq[Stat] => Unit = _ => ()): Seq[Stat] = {
    control.runGuarded(installShutdownHook) {
      val out = scala.collection.mutable.ArrayBuffer.empty[Stat]
      var sweeps = 0L
      var nextCompact = System.currentTimeMillis()
      var nextVacuum = System.currentTimeMillis() + vacuumIntervalMillis
      var stopped = control.isStopped
      while (sweeps < maxSweeps && !stopped) {
        val t = System.currentTimeMillis()
        // each activity fails independently and always advances its own
        // deadline — a persistently failing vacuum must back off on its
        // cadence, not hot-spin, and must not consume compaction sweeps
        if (t >= nextVacuum) {
          nextVacuum = t + vacuumIntervalMillis
          try history.vacuum()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[compactor] vacuum failed: ${e.getMessage}") }
        }
        if (t >= nextCompact) {
          nextCompact = t + intervalMillis
          sweeps += 1
          try {
            val stats = runOnce(spark, lakeRoot, history)
            out ++= stats
            try onSweep(stats)
            catch { case scala.util.control.NonFatal(e) =>
              System.err.println(s"[compactor] onSweep callback failed: ${e.getMessage}") }
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[compactor] sweep failed: ${e.getMessage}")
          }
        }
        val wait = math.min(nextCompact, nextVacuum) - System.currentTimeMillis()
        stopped =
          if (sweeps >= maxSweeps) control.isStopped
          else if (wait > 0) control.awaitOrStop(wait)
          else control.isStopped
      }
      out.toSeq
    }
  }
}

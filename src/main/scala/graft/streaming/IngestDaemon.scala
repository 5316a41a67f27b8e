package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{Fetch, HistoryTable, NemCsv}

/** The complete ingest daemon — the reference's `nemscraper` main loop
  * (/root/reference/src/main.rs:39-74) as one composable pass:
  *
  *   feed page → scrape zip links (S1) → skip already-downloaded
  *   (history anti-join semantics) → download with retries (S3) →
  *   split to the parquet lake (S4-S6, S10) → record history.
  *
  * `runOnce` processes one feed tick (the reference cycles feeds
  * round-robin at 60 s — compose with [[Fetch.RoundRobin]] and a driver
  * loop or `Trigger.ProcessingTime`); everything downstream of the
  * driver-side fetch runs distributed. Idempotent: re-running against the
  * same feed downloads and processes nothing new.
  */
object IngestDaemon {

  final case class TickResult(scraped: Int, downloaded: Int, tablesWritten: Long)

  def runOnce(spark: SparkSession, feedUrl: String, feedHtml: String,
      downloadDir: String, lakeRoot: String, historyRoot: String): TickResult = {
    import spark.implicits._
    val downloadedHist = HistoryTable.downloaded(spark, historyRoot)
    val processedHist = HistoryTable.processed(spark, historyRoot)

    val links = Fetch.scrapeZipLinks(feedHtml, feedUrl)
      .map(u => (u, u.split('/').last))
    // idempotency gate on the filename key (main.rs:177-179)
    val freshNames = downloadedHist
      .filterNew(links.map(_._2).toDF("candidate"), "candidate")
      .as[String].collect().toSet
    val fresh = links.filter(l => freshNames.contains(l._2))

    val downloaded = fresh.map { case (url, name) =>
      val (path, size) = Fetch.download(url, downloadDir)
      (name, url, size, path.toString)
    }
    if (downloaded.nonEmpty) {
      val now = new java.sql.Timestamp(System.currentTimeMillis())
      downloadedHist.add(downloaded.map { case (n, u, s, _) => (n, u, s) }
        .toDF("filename", "url", "size_bytes")
        .withColumn("downloaded_at", org.apache.spark.sql.functions.lit(now)))
    }

    // process everything in the download dir not yet split — NOT just this
    // tick's downloads: a crash between the download-history write and
    // splitToLake would otherwise orphan the file forever (the download
    // gate above would skip it on every later tick)
    val landed = Option(new java.io.File(downloadDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.endsWith(".tmp"))
      .map(_.getAbsolutePath).toSeq
    val toProcess = processedHist
      .filterNew(landed.toDF("candidate"), "candidate")
      .as[String].collect().toSeq
    val tables =
      if (toProcess.isEmpty) 0L
      else {
        val summary = NemCsv.splitToLake(spark, toProcess, lakeRoot)
        val n = summary.count()
        val now = new java.sql.Timestamp(System.currentTimeMillis())
        processedHist.add(toProcess.toDF("filename") // keyed by path
          .withColumn("processed_at", org.apache.spark.sql.functions.lit(now)))
        n
      }
    TickResult(links.size, downloaded.size, tables)
  }
}

package graft.streaming

import graft.SparkSpec
import graft.sources.NemFixture
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** End-to-end reference daemon flow against an in-JVM HTTP feed:
  * scrape → download → split → lake, idempotent on the second tick. */
class IngestDaemonSpec extends SparkSpec {

  def zipBytes(csv: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("PUBLIC_FPP_20250607.CSV"))
    zos.write(csv.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry(); zos.close()
    bos.toByteArray
  }

  test("tick: scrape feed page, download zips, split to lake; second tick is a no-op") {
    val payload = zipBytes(NemFixture.csv)
    val html =
      """<html><a href="PUBLIC_FPP_20250607.zip">r1</a>
        |<a href="unrelated.csv">skip</a></html>""".stripMargin
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    var hits = 0
    server.createContext("/feed/PUBLIC_FPP_20250607.zip", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        hits += 1
        x.sendResponseHeaders(200, payload.length)
        x.getResponseBody.write(payload); x.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/feed/"
      val dl = tmpDir("daemon_dl"); val lake = tmpDir("daemon_lake"); val hist = tmpDir("daemon_hist")
      val r1 = IngestDaemon.runOnce(spark, base, html, dl, lake, hist)
      assert(r1 === IngestDaemon.TickResult(scraped = 1, downloaded = 1, tablesWritten = 2))
      assert(hits === 1)
      // lake content: row invariant holds end-to-end
      assert(spark.read.parquet(s"$lake/FPP---UNIT_MW---1").count() === 4)
      assert(spark.read.parquet(s"$lake/FPP---REGION_FREQ_MEASURE---1").count() === 3)
      // second tick: same feed → nothing downloaded, nothing processed
      val r2 = IngestDaemon.runOnce(spark, base, html, dl, lake, hist)
      assert(r2 === IngestDaemon.TickResult(scraped = 1, downloaded = 0, tablesWritten = 0))
      assert(hits === 1) // the server was not contacted again
      assert(spark.read.parquet(s"$lake/FPP---UNIT_MW---1").count() === 4) // no dupes
      // crash-recovery: a file that was downloaded (on disk) but never
      // split (e.g. JVM died before splitToLake) is picked up by the
      // next tick even though the feed offers nothing new
      java.nio.file.Files.write(java.nio.file.Paths.get(dl, "PUBLIC_ORPHAN_20250608.zip"),
        zipBytes(NemFixture.csv.replace("UNIT_MW", "ORPHAN_MW")))
      val r3 = IngestDaemon.runOnce(spark, base, html, dl, lake, hist)
      assert(r3.downloaded === 0 && r3.tablesWritten === 2)
      assert(spark.read.parquet(s"$lake/FPP---ORPHAN_MW---1").count() === 4)
    } finally server.stop(0)
  }
}

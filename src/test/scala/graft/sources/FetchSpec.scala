package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files

/** S1-S3 against an in-JVM HTTP server (zero egress). */
class FetchSpec extends AnyFunSuite {

  test("scrapeZipLinks: absolute + relative hrefs, .zip only, dedup") {
    val html =
      """<html><body>
        |<a href="PUBLIC_FPP_20250607.zip">a</a>
        |<A HREF='/reports/other_20250608.ZIP'>skip-case</A>
        |<a href="https://example.com/abs_20250609.zip">abs</a>
        |<a href="notazip.csv">no</a>
        |<a href="PUBLIC_FPP_20250607.zip">dup</a>
        |</body></html>""".stripMargin
    val links = Fetch.scrapeZipLinks(html, "http://feed.example/reports/")
    assert(links === Seq(
      "http://feed.example/reports/PUBLIC_FPP_20250607.zip",
      "https://example.com/abs_20250609.zip"))
  }

  test("RoundRobin: cycles one feed per tick") {
    val rr = new Fetch.RoundRobin(Seq("a", "b", "c"))
    assert((1 to 7).map(_ => rr.next()) === Seq("a", "b", "c", "a", "b", "c", "a"))
  }

  test("download: tmp+rename success; retry on failure; gives up cleanly") {
    val served = "payload-bytes-123".getBytes("UTF-8")
    var failures = 1 // first request 500s, second succeeds
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/files/f_20250607.zip", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        if (failures > 0) { failures -= 1; x.sendResponseHeaders(500, -1); x.close() }
        else {
          x.sendResponseHeaders(200, served.length)
          x.getResponseBody.write(served); x.close()
        }
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val dir = Files.createTempDirectory("dl").toString
      val (path, size) = Fetch.download(
        s"http://127.0.0.1:$port/files/f_20250607.zip", dir, attempts = 3, backoffMs = 10)
      assert(size === served.length)
      assert(path.getFileName.toString === "f_20250607.zip")
      assert(Files.readAllBytes(path) === served)
      assert(!Files.exists(path.resolveSibling("f_20250607.zip.tmp"))) // no tmp residue
      // a missing path exhausts retries and throws
      intercept[java.io.IOException] {
        Fetch.download(s"http://127.0.0.1:$port/nope.zip", dir, attempts = 2, backoffMs = 10)
      }
    } finally server.stop(0)
  }

  test("WarehouseDdl renders mountable DDL for lake tables") {
    val ddl = WarehouseDdl.bigQueryExternalTable("nem", "FPP---UNIT_MW---1", "gs://bucket/compacted")
    assert(ddl.contains("`nem.FPP___UNIT_MW___1`"))
    assert(ddl.contains("PARTITION COLUMNS (date DATE)"))
    assert(ddl.contains("gs://bucket/compacted/FPP---UNIT_MW---1/*"))
    val sddl = WarehouseDdl.sparkExternalTable("nem", "FPP---UNIT_MW---1", "/lake")
    assert(sddl.contains("USING PARQUET") && sddl.contains("PARTITIONED BY (date)"))
  }
}

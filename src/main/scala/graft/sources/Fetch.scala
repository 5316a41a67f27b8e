package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Feed scraping + download plumbing (driver-side IO, not Spark ops) —
  * the reference's fetch stage:
  *  - S1 link scrape: GET a feed page, select `a[href$=".zip"]`, resolve
  *    relative URLs (/root/reference/src/fetch/urls.rs:89-157);
  *  - S2 scheduler: round-robin over feeds, one feed per tick
  *    (urls.rs:167-210);
  *  - S3 download: stream to `.tmp`, atomic rename on success, retries
  *    with exponential backoff (src/fetch/zips.rs:21-111).
  */
object Fetch {

  private val Href = """(?is)<a\s+[^>]*href\s*=\s*["']([^"']+)["']""".r

  /** S1: zip links in an HTML page, resolved against the page URL.
    * Suffix match is case-sensitive like the reference's
    * `a[href$=".zip"]` selector (urls.rs:107). */
  def scrapeZipLinks(html: String, pageUrl: String): Seq[String] = {
    val base = URI.create(pageUrl)
    Href.findAllMatchIn(html)
      .map(_.group(1))
      .filter(_.endsWith(".zip"))
      .map(h => base.resolve(h).toString)
      .distinct.toSeq
  }

  /** S2: stateful round-robin over a feed list — `next()` yields one feed
    * per tick, cycling (urls.rs:176-209). */
  final class RoundRobin[T](items: Seq[T]) {
    require(items.nonEmpty, "empty feed list")
    private var i = -1
    def next(): T = { i = (i + 1) % items.size; items(i) }
  }

  /** S3: download to `<destDir>/<filename>.tmp`, rename to final name on
    * success; `attempts` tries with exponential backoff (1-2-4 s pattern,
    * zips.rs:47,80). Returns the final path and size. */
  private def defaultClient: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL) // feed hosts 301 http→https
    .build()

  def download(url: String, destDir: String, attempts: Int = 3,
      backoffMs: Long = 1000L,
      client: HttpClient = defaultClient): (Path, Long) = {
    val name = url.split('/').last
    val dest = Paths.get(destDir, name)
    val tmp = Paths.get(destDir, name + ".tmp")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < attempts) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
        // TRUNCATE: a stale .tmp from a killed run must not leave its tail
        val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.WRITE))
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
        Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        return (dest, Files.size(dest))
      } catch {
        case e: Throwable =>
          lastErr = e
          Files.deleteIfExists(tmp)
          attempt += 1
          if (attempt < attempts) Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new java.io.IOException(s"download failed after $attempts attempts: $url", lastErr)
  }
}

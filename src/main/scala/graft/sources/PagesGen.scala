package graft.sources

import graft.htmlkit.HtmlKit
import graft.httpkit.HttpKit
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/**
 * Deterministic synthetic pages-table generator (seed-free: every row is a
 * pure function of its index/url — FIXTURES.md "Scale generator").
 *
 * Two table families, both with the BASELINE.json input_hint schema
 * (url string, warc_ts timestamp, html binary = raw HTTP response bytes,
 * text string, lang string):
 *
 *  1. `fixtures` — one host per reference test (FIXTURES.md table), bodies
 *     rendered with the reference's own html_with_links template
 *     (/root/reference/src/crawler.rs:541-558).
 *  2. `scale(n, hosts)` — a host-partitioned link graph for throughput
 *     benchmarks: hosts hold contiguous url-id blocks, host 0 holds ~30% of
 *     all pages (the skew the north rule's salting/AQE handling must absorb),
 *     pages form a binary tree inside each block (BFS depth ≈ log2(block))
 *     with parent back-links (dedup pressure), ~1% robots-excluded links,
 *     ~1% links to missing rows (network errors), ~2% redirect leaves and
 *     ~1% non-HTML leaves.
 *
 * The `text` column is HtmlKit.extractText(body) for text/html rows —
 * establishing the "byte-identical extracted text per url" invariant the
 * engine is verified against.
 */
object PagesGen {

  final case class PageRow(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

  private val t0Millis = 1767225600000L // 2026-01-01T00:00:00Z

  /** The reference's html_with_links fixture template (crawler.rs:541-558). */
  def htmlWithLinks(links: Seq[String]): String = {
    val anchors = links.map(l => s"""<a href="$l">Something</a>""").mkString("\n")
    s"""<!DOCTYPE html>
       |<html>
       |    <head></head>
       |    <body>
       |        $anchors
       |    </body>
       |</html>
       |""".stripMargin
  }

  def okHtml(body: String): Array[Byte] =
    HttpKit.render(200, Seq("Content-Type" -> "text/html"), body)
  def okHtmlUtf8(body: String): Array[Byte] =
    HttpKit.render(200, Seq("Content-Type" -> "text/html; charset=utf-8"), body)
  def okOther(contentType: String, body: String): Array[Byte] =
    HttpKit.render(200, Seq("Content-Type" -> contentType), body)
  def okText(body: String): Array[Byte] =
    HttpKit.render(200, Seq("Content-Type" -> "text/plain"), body)
  def redirect(status: Int, location: String): Array[Byte] =
    HttpKit.render(status, Seq("Location" -> location), "")
  def failure(status: Int, body: String): Array[Byte] =
    HttpKit.render(status, Seq("Content-Type" -> "text/plain"), body)
  def okNoContentType(body: String): Array[Byte] =
    HttpKit.render(200, Seq.empty, body)

  def mkRow(url: String, bytes: Array[Byte], idx: Long): PageRow = {
    val text = HttpKit.parseResponse(bytes) match {
      case Some(r) if r.status >= 200 && r.status < 300 &&
        r.header("Content-Type").flatMap(HttpKit.essence).contains("text/html") =>
        HtmlKit.extractText(r.bodyString)
      case _ => ""
    }
    PageRow(url, new Timestamp(t0Millis + idx * 1000L), bytes, text, "en")
  }

  // ---- fixtures (FIXTURES.md; one isolated host per reference test) -------

  /** Host for a fixture id, e.g. host("cycle") == "https://cycle.example.com". */
  def host(fixture: String): String = s"https://$fixture.example.com"
  val X = "https://notexample.com"

  def fixtureRows(): Seq[PageRow] = {
    val rows = Vector.newBuilder[PageRow]
    var idx = 0L
    def add(url: String, bytes: Array[Byte]): Unit = { rows += mkRow(url, bytes, idx); idx += 1 }

    // server_error (crawler.rs:560-581)
    add(s"${host("server-error")}/start", failure(500, "Internal server error"))
    // network_error (crawler.rs:583-597): NO row for the seed
    // external_only (crawler.rs:599-621)
    add(s"${host("external-only")}/start", okHtml(htmlWithLinks(Seq(s"$X/another"))))
    // redirect_target (crawler.rs:623-656)
    locally {
      val h = host("redirect-target")
      add(s"$h/redirect", redirect(302, s"$h/target"))
      add(s"$h/target", okHtml(htmlWithLinks(Seq(s"$X/another"))))
    }
    // multi_links (crawler.rs:658-680)
    locally {
      val h = host("multi-links")
      add(s"$h/start", okHtml(htmlWithLinks(Seq(s"$h/link1", s"$h/link2"))))
      add(s"$h/link1", okHtml(htmlWithLinks(Seq.empty)))
      add(s"$h/link2", okHtml(htmlWithLinks(Seq.empty)))
    }
    // cycle (crawler.rs:682-704)
    locally {
      val h = host("cycle")
      add(s"$h/start", okHtml(htmlWithLinks(Seq(s"$h/link1"))))
      add(s"$h/link1", okHtml(htmlWithLinks(Seq(s"$h/link2"))))
      add(s"$h/link2", okHtml(htmlWithLinks(Seq(s"$h/start"))))
    }
    // parallel_cycle (crawler.rs:706-735)
    locally {
      val h = host("parallel-cycle")
      add(s"$h/start", okHtml(htmlWithLinks(Seq(s"$h/link1", s"$h/link2"))))
      add(s"$h/link1", okHtml(htmlWithLinks(Seq(s"$h/start", s"$h/link2"))))
      add(s"$h/link2", okHtml(htmlWithLinks(Seq(s"$h/start", s"$h/link1"))))
    }
    // external_redirect (crawler.rs:737-757)
    add(s"${host("external-redirect")}/redirect", redirect(302, s"$X/target"))
    // redirect_no_revisit (crawler.rs:759-790)
    locally {
      val h = host("redirect-no-revisit")
      add(s"$h/start", okHtml(htmlWithLinks(Seq(s"$h/redirect"))))
      add(s"$h/redirect", redirect(302, s"$h/start"))
    }
    // redirect_found_first (crawler.rs:792-826)
    locally {
      val h = host("redirect-found-first")
      add(s"$h/redirect", redirect(302, s"$h/target"))
      add(s"$h/target", okHtml(htmlWithLinks(Seq(s"$h/back"))))
      add(s"$h/back", okHtml(htmlWithLinks(Seq(s"$h/target"))))
    }
    // fragments (crawler.rs:828-850)
    locally {
      val h = host("fragments")
      add(s"$h/page", okHtml(htmlWithLinks(Seq(s"$h/page#link1", s"$h/page#link2"))))
    }
    // non_html (crawler.rs:852-866)
    add(s"${host("non-html")}/thing.pdf", okOther("x-application/pdf", "XXXX"))
    // robots_excluded (crawler.rs:868-894; integration.rs:119-197)
    locally {
      val h = host("robots-excluded")
      add(s"$h/robots.txt", okText("User-agent: *\nDisallow: /disallowed\n"))
      add(s"$h/start", okHtml(htmlWithLinks(Seq(s"$X/another", s"$h/disallowed"))))
      add(s"$h/disallowed", okHtmlUtf8(htmlWithLinks(Seq(s"$h/hidden"))))
      add(s"$h/hidden", okHtmlUtf8(""))
    }
    // robots_seed_excluded (gap coverage: the seed itself is disallowed)
    locally {
      val h = host("robots-seed-excluded")
      add(s"$h/robots.txt", okText("User-agent: *\nDisallow: /\n"))
      add(s"$h/start", okHtml(htmlWithLinks(Seq.empty)))
    }
    // robots_failure (http_client.rs:96-105: non-404 robots error fails the crawl)
    locally {
      val h = host("robots-failure")
      add(s"$h/robots.txt", failure(500, "boom"))
      add(s"$h/start", okHtml(htmlWithLinks(Seq.empty)))
    }
    // politeness (north-star crawl-delay budget; no reference counterpart)
    locally {
      val h = host("politeness")
      add(s"$h/robots.txt", okText("User-agent: *\nCrawl-delay: 10\n"))
      add(s"$h/start", okHtml(htmlWithLinks(Seq(s"$h/a", s"$h/b"))))
      add(s"$h/a", okHtml(htmlWithLinks(Seq.empty)))
      add(s"$h/b", okHtml(htmlWithLinks(Seq.empty)))
    }
    // relative_redirect @ IP host (integration.rs:59-85)
    add("http://127.0.0.1:8001/start", redirect(301, "/next"))
    // no_content_type (http_client.rs:69-70)
    add(s"${host("no-content-type")}/start", okNoContentType("hello"))
    // bad_mime (http_client.rs:72 `.parse()?`)
    add(s"${host("bad-mime")}/start", okOther("not a mime", "hello"))
    // no_location (http_client.rs:83-85)
    add(s"${host("no-location")}/start", HttpKit.render(301, Seq.empty, ""))
    // collected_things @ IP host (integration.rs:207-330)
    locally {
      val h = "http://127.0.0.1:8000"
      add(s"$h/start", okHtml(
        s"""<!DOCTYPE html>
           |<html>
           |    <head></head>
           |    <body>
           |        <a href="$X/another">Interesting</a>
           |        <a href="$h/another">Interesting</a>
           |        <a href="$h/third">Interesting</a>
           |        <a href="$h/pdf">Interesting</a>
           |        <a href="$h/redirect">Interesting</a>
           |        <a href="/relative">Interesting</a>
           |    </body>
           |</html>
           |""".stripMargin))
      add(s"$h/another", okHtmlUtf8(htmlWithLinks(Seq(s"$h/third"))))
      add(s"$h/third", okHtmlUtf8(htmlWithLinks(Seq("/relative"))))
      add(s"$h/pdf", okOther("x-application/something", "XXXX"))
      add(s"$h/redirect", redirect(301, s"$h/start"))
      add(s"$h/relative", okHtmlUtf8(htmlWithLinks(Seq("/third"))))
    }
    rows.result()
  }

  def fixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(fixtureRows()).toDF()
  }

  /** Multi-capture fixture table — the Common-Crawl shape the input
    * contract allows (several `warc_ts` snapshots per url). /start is
    * captured TWICE: an older capture linking to /old-only and a newer one
    * (different body AND Content-Type) linking to /new. A latest-snapshot
    * fetch serves the newer body, so a crawl discovers /new and never
    * /old-only — crawling /old-only at all proves the stale capture won. */
  def multiSnapshotFixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val h = host("multi-snapshot")
    val rows = Seq(
      mkRow(s"$h/start", okHtml(htmlWithLinks(Seq(s"$h/old-only"))), 0L),
      mkRow(s"$h/start", okHtmlUtf8(htmlWithLinks(Seq(s"$h/new"))), 86400L),
      mkRow(s"$h/old-only", okHtml(htmlWithLinks(Seq.empty)), 1L),
      mkRow(s"$h/new", okHtml(htmlWithLinks(Seq.empty)), 2L))
    spark.createDataset(rows).toDF()
  }

  // ---- scale graph ---------------------------------------------------------

  final case class ScaleSpec(n: Long, hosts: Int) {
    // host 0 holds 30% of urls; the rest share the remaining 70% evenly
    val heavy: Long = math.max(1L, (n * 3) / 10)
    val restEach: Long = math.max(1L, (n - heavy) / math.max(1, hosts - 1))
    def hostOf(id: Long): Int =
      if (id < heavy) 0 else math.min(hosts - 1, (1 + (id - heavy) / restEach).toInt)
    def blockStart(h: Int): Long = if (h == 0) 0L else heavy + (h - 1) * restEach
    def blockSize(h: Int): Long = {
      if (h == 0) heavy
      else if (h == hosts - 1) n - blockStart(h)
      else restEach
    }
    def hostName(h: Int): String = s"http://host$h.test"
    def urlOf(id: Long): String = s"${hostName(hostOf(id))}/page$id"
    def seeds: Seq[String] = (0 until hosts).map(h => s"${hostName(h)}/page${blockStart(h)}")
  }

  /** Deterministic page for a scale-graph url id. */
  def scaleRow(spec: ScaleSpec, id: Long): Seq[PageRow] = {
    val h = spec.hostOf(id)
    val start = spec.blockStart(h)
    val size = spec.blockSize(h)
    val local = id - start
    val hostUrl = spec.hostName(h)
    val url = spec.urlOf(id)

    // leaves in the top 4% of local ids get special treatment
    val tail = local >= size - math.max(1L, size / 25)
    val mod = id % 97
    if (tail && mod % 5 == 0) {
      // redirect leaf → local sibling (same domain, followed if new)
      val target = spec.urlOf(start + (local / 2))
      return Seq(mkRow(url, redirect(if (mod % 2 == 0) 301 else 302, target), id))
    }
    if (tail && mod % 5 == 1) {
      return Seq(mkRow(url, okOther("application/pdf", s"PDF$id"), id)) // non-html leaf
    }
    if (tail && mod % 5 == 2) {
      return Seq.empty // missing row: network error when linked
    }
    // tree children (branching factor 16 → BFS depth ~log16(block), so a
    // crawl is few rounds of big fetches, not many rounds of small ones)
    val bf = 16
    val links = Vector.newBuilder[String]
    var ci = 1
    while (ci <= bf) {
      val c = bf.toLong * local + ci
      if (c < size) links += spec.urlOf(start + c)
      ci += 1
    }
    if (local > 0) links += spec.urlOf(start + (local - 1) / bf) // parent (always dup)
    if (mod % 7 == 0) links += s"${spec.hostName((h + 1) % spec.hosts)}/page0-external" // external, recorded not followed
    if (mod % 31 == 0) links += s"$hostUrl/excluded/$id" // robots-denied candidate
    val filler = s"Deterministic filler text for page $id on host $h. " * (4 + (id % 8).toInt)
    val body =
      s"""<!DOCTYPE html>
         |<html><head><title>Page $id</title></head>
         |<body>
         |<p>$filler</p>
         |${links.result().map(l => s"""<a href="$l">link</a>""").mkString("\n")}
         |</body></html>
         |""".stripMargin
    Seq(mkRow(url, okHtml(body), id))
  }

  def robotsRows(spec: ScaleSpec): Seq[PageRow] =
    (0 until spec.hosts).map { h =>
      mkRow(s"${spec.hostName(h)}/robots.txt",
        okText("User-agent: *\nDisallow: /excluded\n"), spec.n + h)
    }

  /** Distributed generation: rows are a pure function of spark.range ids. */
  def scale(spark: SparkSession, n: Long, hosts: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    val spec = ScaleSpec(n, hosts)
    val pages = spark.range(0, n, 1, partitions)
      .flatMap(id => scaleRow(spec, id))
    val robots = spark.createDataset(robotsRows(spec))
    pages.union(robots).toDF()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.robotskit.RobotsKit

/**
 * Table tests for the Google-matcher semantics the reference depends on
 * (/root/reference/src/crawler.rs:223-231: `one_agent_allowed_by_robots
 * (robots, "MikesCrawler", url)`); the robots-exclusion fixture is from
 * crawler.rs:868-894 and tests/integration.rs:119-197.
 */
class RobotsKitSpec extends AnyFunSuite {

  private val UA = "MikesCrawler"
  private def allowed(robots: String, url: String): Boolean =
    RobotsKit.allowed(robots, UA, url)

  test("reference fixture: global disallow of /excluded") {
    val robots = "User-agent: *\nDisallow: /excluded\n"
    assert(!allowed(robots, "https://example.com/excluded"))
    assert(!allowed(robots, "https://example.com/excluded/sub"))
    assert(!allowed(robots, "https://example.com/excluded.html"))
    assert(allowed(robots, "https://example.com/page"))
    assert(allowed(robots, "https://example.com/"))
  }

  test("no rules / empty robots → everything allowed") {
    assert(allowed("", "https://example.com/x"))
    assert(allowed("# only comments\n", "https://example.com/x"))
  }

  test("longest match wins; allow wins ties") {
    val robots =
      """User-agent: *
        |Disallow: /a
        |Allow: /a/b
        |""".stripMargin
    assert(!allowed(robots, "https://e.com/a"))
    assert(!allowed(robots, "https://e.com/a/c"))
    assert(allowed(robots, "https://e.com/a/b"))
    assert(allowed(robots, "https://e.com/a/b/deep"))
    // exact tie: allow wins
    val tie = "User-agent: *\nDisallow: /x\nAllow: /x\n"
    assert(allowed(tie, "https://e.com/x"))
  }

  test("wildcards * and $") {
    val robots =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /private*data
        |""".stripMargin
    assert(!allowed(robots, "https://e.com/doc.pdf"))
    assert(!allowed(robots, "https://e.com/a/b/c.pdf"))
    assert(allowed(robots, "https://e.com/doc.pdf.html"))
    assert(!allowed(robots, "https://e.com/private/secret/data"))
    assert(!allowed(robots, "https://e.com/privatedata"))
    assert(allowed(robots, "https://e.com/private"))
  }

  test("agent group selection: specific group overrides global entirely") {
    val robots =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: MikesCrawler
        |Disallow: /only-this
        |""".stripMargin
    assert(allowed(robots, "https://e.com/anything")) // global Disallow:/ ignored
    assert(!allowed(robots, "https://e.com/only-this"))
  }

  test("agent token matching is case-insensitive and product-token based") {
    val robots =
      """User-agent: mikescrawler/2.0
        |Disallow: /x
        |""".stripMargin
    assert(!allowed(robots, "https://e.com/x"))
    val robots2 = "User-agent: OtherBot\nDisallow: /x\n"
    assert(allowed(robots2, "https://e.com/x"))
  }

  test("consecutive user-agent lines share one group; rules close the run") {
    val robots =
      """User-agent: OtherBot
        |User-agent: MikesCrawler
        |Disallow: /shared
        |
        |User-agent: ThirdBot
        |Disallow: /third-only
        |""".stripMargin
    assert(!allowed(robots, "https://e.com/shared"))
    assert(allowed(robots, "https://e.com/third-only"))
  }

  test("query string participates in matching; fragment does not") {
    val robots = "User-agent: *\nDisallow: /search?q=\n"
    assert(!allowed(robots, "https://e.com/search?q=x"))
    assert(allowed(robots, "https://e.com/search"))
    val robots2 = "User-agent: *\nDisallow: /p$\n"
    assert(!allowed(robots2, "https://e.com/p#frag"))
  }

  test("empty disallow value matches nothing; key typos tolerated") {
    assert(allowed("User-agent: *\nDisallow:\n", "https://e.com/x"))
    assert(!allowed("User-agent: *\nDissallow: /x\n", "https://e.com/x"))
    assert(!allowed("useragent: *\ndisalow: /x\n", "https://e.com/x"))
  }

  test("root url and bare-host paths") {
    val robots = "User-agent: *\nDisallow: /\n"
    assert(!allowed(robots, "https://e.com/"))
    assert(!allowed(robots, "https://e.com"))
    assert(!allowed(robots, "https://e.com/any"))
  }

  test("crawl-delay extraction with group selection (politeness extension)") {
    val robots =
      """User-agent: *
        |Crawl-delay: 10
        |
        |User-agent: MikesCrawler
        |Crawl-delay: 1.5
        |Disallow: /x
        |""".stripMargin
    assert(RobotsKit.crawlDelay(robots, UA).contains(1.5))
    assert(RobotsKit.crawlDelay("User-agent: *\nCrawl-delay: 10\n", UA).contains(10.0))
    assert(RobotsKit.crawlDelay("", UA).isEmpty)
  }

  test("/robots.txt is implicitly allowed regardless of rules (RFC 9309 §2.3.1)") {
    val robots = "User-agent: *\nDisallow: /\n"
    assert(allowed(robots, "https://e.com/robots.txt"))
    assert(!allowed(robots, "https://e.com/robots.txt2")) // only the exact path
    assert(!allowed(robots, "https://e.com/anything"))
    assert(allowed("User-agent: *\nDisallow: /robots.txt\n", "https://e.com/robots.txt"))
  }

  test("Allow ending in /index.htm(l) also allows the bare directory (robots.cc expansion)") {
    val robots =
      """User-agent: *
        |Disallow: /
        |Allow: /dir/index.html
        |""".stripMargin
    assert(allowed(robots, "https://e.com/dir/index.html"))
    assert(allowed(robots, "https://e.com/dir/")) // the dir/$ expansion
    assert(!allowed(robots, "https://e.com/dir/other")) // $-anchored: only the bare dir
    assert(!allowed(robots, "https://e.com/dir")) // no trailing slash → no match
    // expansion applies to the root directory too
    val rootIdx = "User-agent: *\nDisallow: /\nAllow: /index.htm\n"
    assert(allowed(rootIdx, "https://e.com/"))
    assert(allowed(rootIdx, "https://e.com/index.htm"))
    assert(!allowed(rootIdx, "https://e.com/page"))
    // Disallow gets no expansion
    val dis = "User-agent: *\nAllow: /\nDisallow: /dir/index.html\n"
    assert(allowed(dis, "https://e.com/dir/"))
  }

  test("sitemap extraction: case, whitespace, comments, empties, duplicates, BOM") {
    import RobotsKit.sitemaps
    val body =
      "﻿User-agent: *\n" +
        "Disallow: /private\n" +
        "Sitemap: https://ex.org/a.xml\n" +
        "  sItEmAp :   https://ex.org/b.xml  \n" +
        "# Sitemap: https://ex.org/commented.xml\n" +
        "Sitemap: https://ex.org/c.xml # trailing comment\n" +
        "Sitemap:\n" +
        "sitemap: https://ex.org/dup.xml\n" +
        "sitemap: https://ex.org/dup.xml\n"
    assert(sitemaps(body) == Vector(
      "https://ex.org/a.xml", "https://ex.org/b.xml", "https://ex.org/c.xml",
      "https://ex.org/dup.xml", "https://ex.org/dup.xml"))
    assert(sitemaps("") == Vector.empty)
    assert(sitemaps("User-agent: *\nDisallow: /") == Vector.empty)
  }

  test("pattern matcher unit table") {
    import RobotsKit.patternMatches
    assert(patternMatches("/", "/anything"))
    assert(patternMatches("/fish*", "/fishheads/yummy.html"))
    assert(patternMatches("/fish", "/fish.html"))
    assert(!patternMatches("/fish", "/Fish.html")) // case-sensitive
    assert(patternMatches("/*.php", "/folder/filename.php"))
    assert(patternMatches("/*.php$", "/filename.php"))
    assert(!patternMatches("/*.php$", "/filename.php5"))
    assert(patternMatches("/fish*.php", "/fishheads/catfish.php?parameters"))
    assert(!patternMatches("/fish$", "/fishy"))
    assert(patternMatches("/fish$", "/fish"))
    assert(patternMatches("/a*b*c", "/aXbYc-and-more"))
    assert(!patternMatches("/a*b*c$", "/aXbYc-and-more"))
  }
}

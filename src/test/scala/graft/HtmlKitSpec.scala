package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.htmlkit.HtmlKit
import graft.urlkit.UrlKit

/**
 * Ports of the reference link-extractor tests
 * (/root/reference/src/link_extractor.rs:94-216) plus tokenizer edge cases.
 * All reference fixtures deliberately end with an unclosed `</html` tail.
 */
class HtmlKitSpec extends AnyFunSuite {

  private val base = "https://example.com/start"

  private def links(html: String): Vector[HtmlKit.Link] =
    HtmlKit.extractLinksStr(base, html)
  private def internal(html: String): Vector[String] =
    links(html).filter(_.internal).map(_.url)
  private def external(html: String): Vector[String] =
    links(html).filterNot(_.internal).map(_.url)

  test("empty_lists_for_empty_html (link_extractor.rs:106-121)") {
    val html =
      """<!DOCTYPE html>
        |<html>
        |    <head></head>
        |    <body>
        |        Boring!
        |    </body>
        |</html
        |""".stripMargin
    assert(links(html).isEmpty)
  }

  test("extracts_links_in_domain_as_internal_link (link_extractor.rs:123-144)") {
    val html =
      """<!DOCTYPE html>
        |<html>
        |    <head></head>
        |    <body>
        |        <a href="https://example.com/another">Interesting</a>
        |    </body>
        |</html
        |""".stripMargin
    assert(internal(html) == Vector("https://example.com/another"))
    assert(external(html).isEmpty)
  }

  test("continues_after_script_tags (link_extractor.rs:146-171)") {
    val html =
      """<!DOCTYPE html>
        |<html>
        |    <head></head>
        |    <body>
        |        <script>
        |            function get_string() {
        |                return "Some JS here";
        |            }
        |            alert(get_string())
        |        </script>
        |        <a href="https://example.com/another">Interesting</a>
        |    </body>
        |</html
        |""".stripMargin
    assert(internal(html) == Vector("https://example.com/another"))
  }

  test("extracts_links_in_other_domain_as_external_link (link_extractor.rs:173-194)") {
    val html =
      """<!DOCTYPE html>
        |<html>
        |    <head></head>
        |    <body>
        |        <a href="https://notexample.com/another">Interesting</a>
        |    </body>
        |</html
        |""".stripMargin
    assert(external(html) == Vector("https://notexample.com/another"))
    assert(internal(html).isEmpty)
  }

  test("relative_links_are_internal_links (link_extractor.rs:196-215)") {
    val html =
      """<!DOCTYPE html>
        |<html>
        |    <head></head>
        |    <body>
        |        <a href="/another">Interesting</a>
        |    </body>
        |</html
        |""".stripMargin
    assert(internal(html) == Vector("https://example.com/another"))
  }

  test("document order and duplicates preserved (integration.rs:306-315)") {
    val html =
      """<body>
        |<a href="https://notexample.com/another">e</a>
        |<a href="/another">1</a>
        |<a href="/third">2</a>
        |<a href="/another">1 again</a>
        |<a href="/third">2 again</a>
        |</body>""".stripMargin
    assert(internal(html) == Vector(
      "https://example.com/another", "https://example.com/third",
      "https://example.com/another", "https://example.com/third"))
    assert(external(html) == Vector("https://notexample.com/another"))
    // positions are global document order across both lists
    assert(links(html).map(_.pos) == Vector(0, 1, 2, 3, 4))
  }

  test("first href wins; duplicate attributes dropped (link_extractor.rs:33-37)") {
    val html = """<a href="/first" href="/second">x</a>"""
    assert(internal(html) == Vector("https://example.com/first"))
    // anchor without href is skipped
    assert(links("""<a name="x">no href</a>""").isEmpty)
    // unparseable href is skipped (reference logs and continues)
    assert(links("""<a href="http://">bad</a><a href="/ok">ok</a>""").map(_.url) ==
      Vector("https://example.com/ok"))
  }

  test("attribute syntax variants") {
    assert(internal("""<a href=/unquoted>x</a>""") == Vector("https://example.com/unquoted"))
    assert(internal("""<a href='/single'>x</a>""") == Vector("https://example.com/single"))
    assert(internal("""<A HREF="/upper">x</A>""") == Vector("https://example.com/upper"))
    assert(internal("""<a  class="z"   href = "/spaced" >x</a>""") == Vector("https://example.com/spaced"))
    assert(internal("""<a href="/self"/>""") == Vector("https://example.com/self"))
  }

  test("character references decoded in attribute values") {
    assert(internal("""<a href="/a&amp;b">x</a>""") == Vector("https://example.com/a&b"))
    assert(internal("""<a href="/a&#x2F;b">x</a>""") == Vector("https://example.com/a/b"))
    // legacy no-semicolon rule: &ampx is NOT decoded in attributes
    assert(internal("""<a href="/a&ampx">x</a>""") == Vector("https://example.com/a&ampx"))
  }

  test("full HTML5 named-entity table (html5ever set, ~2200 names)") {
    // names far outside the old common subset — from the WHATWG entities list
    assert(HtmlKit.extractText("a &rarr; b") == "a → b")
    assert(HtmlKit.extractText("&Uuml;ber") == "Über")
    assert(HtmlKit.extractText("&NotEqualTilde;") == "≂̸") // multi-codepoint value
    assert(HtmlKit.extractText("&CounterClockwiseContourIntegral;") == "∳")
    assert(HtmlKit.extractText("x &there4; y") == "x ∴ y")
    // semicolon-less legacy forms (the ~200-entry legacy set)
    assert(HtmlKit.extractText("&Auml motor") == "Ä motor")
    assert(HtmlKit.extractText("&notit;") == "¬it;") // longest legacy prefix 'not'
    assert(HtmlKit.extractText("&notin;") == "∉")    // semicolon form wins over prefix
    // non-legacy names require the semicolon
    assert(HtmlKit.extractText("&rarr stays") == "&rarr stays")
    // entity in an attribute href
    assert(internal("""<a href="/x?a&leq;b">t</a>""") ==
      Vector("https://example.com/x?a%E2%89%A4b"))
  }

  test("comments, doctype, bogus comments skipped") {
    val html = """<!-- <a href="/hidden">no</a> --><!DOCTYPE html><?php echo ?><a href="/yes">y</a>"""
    assert(internal(html) == Vector("https://example.com/yes"))
    assert(internal("<!--> <a href='/x'>y</a>") == Vector("https://example.com/x"))
  }

  test("tokenizer-only parity: no rawtext switching in link mode (html5ever TokenSinkResult::Continue)") {
    // the reference WOULD extract this link because its sink never requests
    // the RAWTEXT state — see HtmlKit scaladoc
    val html = """<script>var s = '<a href="/from-script">x</a>';</script>"""
    assert(internal(html) == Vector("https://example.com/from-script"))
  }

  test("EOF mid-tag discards the partial tag") {
    assert(links("""<a href="/ok">x</a><a href="/trunc""").map(_.url) ==
      Vector("https://example.com/ok"))
    assert(HtmlKit.extractText("hello<a trunc") == "hello")
  }

  test("extractText: tags stripped, script/style excluded, entities decoded") {
    val html =
      """<!DOCTYPE html><html><head><title>T</title>
        |<style>body { color: red }</style>
        |<script>var x = 1 < 2;</script></head>
        |<body>Hello &amp; <b>world</b>!</body></html
        |""".stripMargin
    val t = HtmlKit.extractText(html)
    assert(t.contains("Hello & world!"))
    assert(!t.contains("color: red"))
    assert(!t.contains("var x"))
    assert(t.contains("T")) // title is text
  }

  test("extractText is deterministic and total on hostile input") {
    val hostiles = Seq("", "<", "</", "<!", "<!-", "&", "&#", "&#x;", "<a", ">><<",
      "<script>never closed", "﻿bom text", "a&#0;b", "&#xD800;x")
    hostiles.foreach { h =>
      val a = HtmlKit.extractText(h)
      val b = HtmlKit.extractText(h)
      assert(a == b)
    }
    assert(HtmlKit.extractText("﻿bom text") == "bom text")
    assert(HtmlKit.extractText("a&#0;b") == "a�b")
  }

  test("IP-host pages: None==None domain quirk end to end (crawler tests use 127.0.0.1)") {
    val ls = HtmlKit.extractLinksStr("http://127.0.0.1:8000/start",
      """<a href="/relative">x</a><a href="http://10.9.9.9/other">y</a><a href="https://example.com/z">z</a>""")
    assert(ls.map(l => (l.url, l.internal)) == Vector(
      ("http://127.0.0.1:8000/relative", true),
      ("http://10.9.9.9/other", true), // both domains None → "internal"!
      ("https://example.com/z", false)))
  }
}

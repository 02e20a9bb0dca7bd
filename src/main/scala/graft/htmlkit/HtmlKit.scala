package graft.htmlkit

import graft.urlkit.{Url, UrlKit}
import scala.collection.mutable

/**
 * HTML5 tokenizer subset reproducing the html5ever-0.25.1 *tokenizer-only*
 * behavior the reference relies on (/root/reference/src/link_extractor.rs:64-92):
 * data / tag-open / tag-name / attribute / comment / doctype / bogus-comment
 * states, attribute-name lowercasing, duplicate-attribute dropping (first
 * wins), character-reference decoding in data and attribute values, and
 * tolerance of malformed tails (fixtures end with an unclosed `</html`,
 * link_extractor.rs:108-116 — an EOF mid-tag discards the partial tag, as
 * html5ever does).
 *
 * IMPORTANT parity note (corrects SURVEY.md §2.7 F7): html5ever's tokenizer
 * switches into RAWTEXT/RCDATA states only when the TokenSink returns
 * `TokenSinkResult::RawData` — which only the tree builder does. The
 * reference's PageInfoSink always returns `Continue`
 * (link_extractor.rs:51-61), so the reference tokenizes `<script>`/`<style>`
 * contents as ordinary markup: an `<a href>` inside a script WOULD be
 * extracted by the reference. The `continues_after_script_tags` test
 * (link_extractor.rs:146-171) passes under both interpretations because its
 * script body contains no `<`. We therefore expose two modes:
 *
 *  - `rawtext = false` (link-extraction parity mode, the default for
 *    `extractLinks`): no rawtext switching, byte-for-byte html5ever
 *    tokenizer-only behavior.
 *  - `rawtext = true` (used by `extractText`): script/style/title/textarea/
 *    xmp/iframe/noembed/noframes contents are consumed as rawtext; script
 *    and style contents are excluded from extracted text (Common-Crawl-style
 *    `text` column semantics per BASELINE.json input_hint — the reference
 *    itself has no text extraction, so this is self-anchored via PagesGen).
 */
object HtmlKit {

  trait TokenSink {
    def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {}
    def endTag(name: String): Unit = {}
    /** `raw` holds the enclosing rawtext element name, if any. */
    def chars(text: String, raw: Option[String]): Unit = {}
  }

  private val rawtextElements =
    Set("script", "style", "textarea", "title", "xmp", "iframe", "noembed", "noframes")
  private val textExcludedElements = Set("script", "style")

  // ---- character references ------------------------------------------------

  /**
   * The full HTML5 named-character-reference table (2,231 entries) that
   * html5ever resolves -- loaded from the WHATWG entities list shipped as a
   * resource (graft/entities.tsv: `name<TAB>value`, names carrying the
   * trailing ';' for the semicolon forms exactly as the spec JSON does;
   * control characters in values are backslash-uXXXX-escaped).
   *
   * `named` holds the semicolon forms keyed WITHOUT the ';'; `legacyNoSemi`
   * holds the ~200 legacy entities HTML5 allows without a semicolon.
   */
  private val (named: Map[String, String], legacyNoSemi: Map[String, String]) = {
    def unescape(v: String): String = {
      if (!v.contains('\\')) v
      else {
        val sb = new StringBuilder(v.length)
        var i = 0
        while (i < v.length) {
          val c = v.charAt(i)
          if (c == '\\' && i + 1 < v.length && v.charAt(i + 1) == '\\') { sb.append('\\'); i += 2 }
          else if (c == '\\' && i + 5 < v.length && v.charAt(i + 1) == 'u') {
            sb.append(Integer.parseInt(v.substring(i + 2, i + 6), 16).toChar); i += 6
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      }
    }
    val in = getClass.getResourceAsStream("/graft/entities.tsv")
    require(in != null, "graft/entities.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val withSemi = Map.newBuilder[String, String]
    val noSemi = Map.newBuilder[String, String]
    try src.getLines().foreach { line =>
      val tab = line.indexOf('\t')
      if (tab > 0) {
        val name = line.substring(0, tab)
        val value = unescape(line.substring(tab + 1))
        if (name.endsWith(";")) withSemi += name.dropRight(1) -> value
        else noSemi += name -> value
      }
    } finally src.close()
    (withSemi.result(), noSemi.result())
  }

  /** Try to consume a character reference starting *after* the '&' at `i`.
    * Returns (decoded, newIndex) or null for "not a charref, emit '&'".
    * `inAttribute` applies the HTML5 legacy attribute rule: an entity
    * without ';' followed by [A-Za-z0-9=] is not decoded. */
  private def charRef(s: String, i: Int, inAttribute: Boolean): (String, Int) = {
    if (i >= s.length) return null
    val c = s.charAt(i)
    if (c == '#') {
      var j = i + 1
      var hexMode = false
      if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hexMode = true; j += 1 }
      val start = j
      while (j < s.length && (if (hexMode) isHexDigit(s.charAt(j)) else s.charAt(j).isDigit)) j += 1
      if (j == start) return null
      var cp =
        try java.lang.Long.parseLong(s.substring(start, j), if (hexMode) 16 else 10)
        catch { case _: NumberFormatException => 0x110000L }
      val end = if (j < s.length && s.charAt(j) == ';') j + 1 else j
      // HTML5 numeric reference fixups (subset): null, out-of-range and
      // surrogates → U+FFFD; C1 controls → windows-1252 mappings
      if (cp == 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) cp = 0xfffd
      else if (cp >= 0x80 && cp <= 0x9f) cp = c1Remap(cp.toInt)
      (new String(Character.toChars(cp.toInt)), end)
    } else if (c.isLetter || c.isDigit) {
      // longest-match against the named table
      var j = i
      while (j < s.length && (s.charAt(j).isLetterOrDigit)) j += 1
      val maxName = s.substring(i, j)
      val hasSemi = j < s.length && s.charAt(j) == ';'
      if (hasSemi && named.contains(maxName)) return (named(maxName), j + 1)
      // legacy: longest prefix that is a no-semicolon entity
      var k = maxName.length
      while (k > 0) {
        val cand = maxName.substring(0, k)
        if (legacyNoSemi.contains(cand)) {
          val after = i + k
          if (inAttribute && after < s.length &&
            (s.charAt(after).isLetterOrDigit || s.charAt(after) == '=')) return null
          return (legacyNoSemi(cand), after)
        }
        k -= 1
      }
      null
    } else null
  }

  private def c1Remap(cp: Int): Int = cp match {
    case 0x80 => 0x20ac; case 0x82 => 0x201a; case 0x83 => 0x0192; case 0x84 => 0x201e
    case 0x85 => 0x2026; case 0x86 => 0x2020; case 0x87 => 0x2021; case 0x88 => 0x02c6
    case 0x89 => 0x2030; case 0x8a => 0x0160; case 0x8b => 0x2039; case 0x8c => 0x0152
    case 0x8e => 0x017d; case 0x91 => 0x2018; case 0x92 => 0x2019; case 0x93 => 0x201c
    case 0x94 => 0x201d; case 0x95 => 0x2022; case 0x96 => 0x2013; case 0x97 => 0x2014
    case 0x98 => 0x02dc; case 0x99 => 0x2122; case 0x9a => 0x0161; case 0x9b => 0x203a
    case 0x9c => 0x0153; case 0x9e => 0x017e; case 0x9f => 0x0178; case other => other
  }

  @inline private def isHexDigit(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  // ---- tokenizer -----------------------------------------------------------

  def tokenize(html0: String, sink: TokenSink, rawtext: Boolean = false): Unit = {
    // discard BOM (html5ever TokenizerOpts::discard_bom default true)
    val html = if (html0.nonEmpty && html0.charAt(0) == '\uFEFF') html0.substring(1) else html0
    val n = html.length
    var i = 0
    val text = new StringBuilder

    def flushText(raw: Option[String]): Unit = {
      if (text.nonEmpty) { sink.chars(text.toString, raw); text.clear() }
    }

    // Consume a tag starting at the '<' position. Returns index after tag,
    // or -1 if EOF was hit mid-tag (partial tag discarded, like html5ever).
    // Emits the tag to the sink and, in rawtext mode, returns the start-tag
    // name so the caller can enter rawtext.
    var lastTagName: String = null
    var lastTagWasStart = false

    def consumeTag(ltPos: Int): Int = {
      var j = ltPos + 1
      if (j >= n) { text.append('<'); return n }
      val c1 = html.charAt(j)
      if (c1 == '!') {
        // markup declaration: comment / doctype / bogus
        j += 1
        if (html.regionMatches(j, "--", 0, 2)) {
          j += 2
          // comment start edge cases: <!--> and <!---> close immediately
          if (j < n && html.charAt(j) == '>') return j + 1
          if (html.regionMatches(j, "->", 0, 2)) return j + 2
          var k = j
          while (k < n) {
            if (html.regionMatches(k, "-->", 0, 3)) return k + 3
            if (html.regionMatches(k, "--!>", 0, 4)) return k + 4
            k += 1
          }
          n // EOF in comment: comment swallowed
        } else if (html.regionMatches(true, j, "DOCTYPE", 0, 7)) {
          val gt = html.indexOf('>', j)
          if (gt < 0) n else gt + 1
        } else {
          // bogus comment: up to '>'
          val gt = html.indexOf('>', j)
          if (gt < 0) n else gt + 1
        }
      } else if (c1 == '?') {
        val gt = html.indexOf('>', j)
        if (gt < 0) n else gt + 1
      } else if (c1 == '/') {
        j += 1
        if (j >= n) { text.append("</"); return n }
        if (!html.charAt(j).isLetter) {
          if (html.charAt(j) == '>') return j + 1
          val gt = html.indexOf('>', j) // bogus comment
          return if (gt < 0) n else gt + 1
        }
        parseTagProper(j, isEnd = true)
      } else if (c1.isLetter) {
        parseTagProper(j, isEnd = false)
      } else {
        text.append('<')
        j
      }
    }

    // Parses name + attributes from position `j` (first letter of name).
    def parseTagProper(start: Int, isEnd: Boolean): Int = {
      var j = start
      val name = new StringBuilder
      while (j < n && html.charAt(j) != '>' && html.charAt(j) != '/' && !isWs(html.charAt(j))) {
        name.append(toLowerAscii(html.charAt(j))); j += 1
      }
      if (j >= n) return -1 // EOF in tag name: discard (html5ever EOF handling)
      val attrs = mutable.ListBuffer.empty[(String, String)]
      val seen = mutable.Set.empty[String]
      var selfClosing = false

      var state = 0 // 0 beforeName, 1 name, 2 afterName, 3 beforeValue, 4 dq, 5 sq, 6 uq, 7 afterQ
      val an = new StringBuilder
      val av = new StringBuilder
      def commitAttr(): Unit = {
        if (an.nonEmpty) {
          val nm = an.toString
          if (!seen.contains(nm)) { seen += nm; attrs += ((nm, av.toString)) }
        }
        an.clear(); av.clear()
      }
      var done = false
      var discarded = false
      while (!done) {
        if (j >= n) { discarded = true; done = true }
        else {
          val c = html.charAt(j)
          state match {
            case 0 => // before attribute name
              if (isWs(c)) j += 1
              else if (c == '/') { j += 1; if (j < n && html.charAt(j) == '>') { selfClosing = true; j += 1; done = true } }
              else if (c == '>') { j += 1; done = true }
              else { an.append(toLowerAscii(c)); state = 1; j += 1 }
            case 1 => // attribute name
              if (isWs(c)) { state = 2; j += 1 }
              else if (c == '/') { commitAttr(); j += 1; if (j < n && html.charAt(j) == '>') { selfClosing = true; j += 1; done = true } else state = 0 }
              else if (c == '=') { state = 3; j += 1 }
              else if (c == '>') { commitAttr(); j += 1; done = true }
              else { an.append(toLowerAscii(c)); j += 1 }
            case 2 => // after attribute name
              if (isWs(c)) j += 1
              else if (c == '/') { commitAttr(); j += 1; if (j < n && html.charAt(j) == '>') { selfClosing = true; j += 1; done = true } else state = 0 }
              else if (c == '=') { state = 3; j += 1 }
              else if (c == '>') { commitAttr(); j += 1; done = true }
              else { commitAttr(); an.append(toLowerAscii(c)); state = 1; j += 1 }
            case 3 => // before attribute value
              if (isWs(c)) j += 1
              else if (c == '"') { state = 4; j += 1 }
              else if (c == '\'') { state = 5; j += 1 }
              else if (c == '>') { commitAttr(); j += 1; done = true }
              else state = 6
            case 4 | 5 => // quoted value
              val quote = if (state == 4) '"' else '\''
              if (c == quote) { state = 7; j += 1 }
              else if (c == '&') {
                val r = charRef(html, j + 1, inAttribute = true)
                if (r == null) { av.append('&'); j += 1 } else { av.append(r._1); j = r._2 }
              } else { av.append(c); j += 1 }
            case 6 => // unquoted value
              if (isWs(c)) { commitAttr(); state = 0; j += 1 }
              else if (c == '&') {
                val r = charRef(html, j + 1, inAttribute = true)
                if (r == null) { av.append('&'); j += 1 } else { av.append(r._1); j = r._2 }
              } else if (c == '>') { commitAttr(); j += 1; done = true }
              else { av.append(c); j += 1 }
            case 7 => // after quoted value
              commitAttr()
              if (isWs(c)) { state = 0; j += 1 }
              else if (c == '/') { j += 1; if (j < n && html.charAt(j) == '>') { selfClosing = true; j += 1; done = true } else state = 0 }
              else if (c == '>') { j += 1; done = true }
              else state = 0
          }
        }
      }
      if (discarded) return -1
      val nm = name.toString
      if (isEnd) sink.endTag(nm)
      else {
        sink.startTag(nm, attrs.toList, selfClosing)
        lastTagName = nm
        lastTagWasStart = true
      }
      j
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        flushText(None)
        lastTagWasStart = false
        val next = consumeTag(i)
        if (next < 0) { i = n } // EOF mid-tag: discard remainder
        else {
          i = next
          if (rawtext && lastTagWasStart && rawtextElements.contains(lastTagName)) {
            // consume rawtext until matching </name (followed by ws, '/', '>')
            val tag = lastTagName
            val closeSeq = "</" + tag
            var k = i
            var endIdx = -1
            while (endIdx < 0 && k < n) {
              val idx = indexOfIgnoreCase(html, closeSeq, k)
              if (idx < 0) { endIdx = n; k = n }
              else {
                val after = idx + closeSeq.length
                if (after >= n || isWs(html.charAt(after)) || html.charAt(after) == '/' || html.charAt(after) == '>') {
                  endIdx = idx
                } else k = idx + 1
              }
            }
            if (endIdx < 0) endIdx = n
            if (endIdx > i) sink.chars(html.substring(i, endIdx), Some(tag))
            i = endIdx // the `</tag...>` is then tokenized normally
          }
        }
      } else if (c == '&') {
        val r = charRef(html, i + 1, inAttribute = false)
        if (r == null) { text.append('&'); i += 1 }
        else { text.append(r._1); i = r._2 }
      } else {
        text.append(c); i += 1
      }
    }
    flushText(None)
  }

  @inline private def toLowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = from
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  // ---- link extraction (reference parity: link_extractor.rs:26-62) --------

  /** One extracted link, in document order. */
  final case class Link(pos: Int, url: String, internal: Boolean)

  /**
   * From `<a>` start tags: first `href` attribute (duplicate attrs already
   * dropped by the tokenizer, first wins — link_extractor.rs:33-37), joined
   * against the page URL (parse failure → link skipped), classified
   * internal/external by the url-crate `domain()` equality including the
   * None==None IP quirk (link_extractor.rs:39-43).
   */
  def extractLinks(pageUrl: Url, html: String): Vector[Link] = {
    val out = Vector.newBuilder[Link]
    var pos = 0
    val pageDomain = pageUrl.domain
    tokenize(html, new TokenSink {
      override def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        if (name == "a") {
          attrs.collectFirst { case ("href", v) => v }.foreach { href =>
            pageUrl.join(href) match {
              case Right(u) =>
                out += Link(pos, u.serialize, u.domain == pageDomain)
                pos += 1
              case Left(_) => // link skipped, like the reference's logged skip
            }
          }
        }
      }
    }, rawtext = false)
    out.result()
  }

  def extractLinksStr(pageUrl: String, html: String): Vector[Link] =
    UrlKit.parse(pageUrl) match {
      case Right(u) => extractLinks(u, html)
      case Left(_)  => Vector.empty
    }

  // ---- text extraction (input_hint `text` column) ---------------------------

  /**
   * UTF-8 text of the page: concatenation of the tokenizer's character
   * tokens in rawtext-aware mode, with script/style contents excluded.
   * This function DEFINES the `text` column of the pages table (PagesGen),
   * anchoring the "byte-identical extracted text per url" invariant.
   */
  def extractText(html: String): String = {
    val sb = new StringBuilder
    tokenize(html, new TokenSink {
      override def chars(t: String, raw: Option[String]): Unit = {
        if (!raw.exists(textExcludedElements.contains)) sb.append(t)
      }
    }, rawtext = true)
    sb.toString
  }
}

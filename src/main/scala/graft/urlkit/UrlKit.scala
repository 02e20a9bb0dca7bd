package graft.urlkit

/**
 * WHATWG-subset URL algebra, reproducing the observable semantics of the
 * `url` crate 2.2.2 used by the reference (parse at
 * /root/reference/src/api.rs:44, join at src/link_extractor.rs:38 and
 * src/http_client.rs:83, domain at src/link_extractor.rs:39,
 * set_fragment(None) at src/crawler.rs:278, as_str serialization at
 * src/serializers.rs:13-30) for crawl-realistic URLs:
 *
 *  - scheme lowercasing, special-scheme default-port elision
 *  - host lowercasing, WHATWG IPv4 "ends-in-a-number" parsing with
 *    canonical dotted-decimal re-serialization
 *  - path dot-segment removal ("." / ".." / their %2e forms)
 *  - percent-encoding with the WHATWG fragment/path/query/userinfo sets
 *    (existing %XX passes through untouched; non-ASCII is UTF-8 encoded)
 *  - relative-reference resolution (join), including protocol-relative,
 *    path-absolute, query-only, fragment-only and path-relative forms
 *  - `domain()` returns None for IP hosts and host-less URLs — the
 *    None==None quirk that makes two IP-hosted sites compare "same
 *    domain" (reference: src/link_extractor.rs:39-43) is reproduced by
 *    callers using null-safe equality on this Option.
 *
 * Pure Scala, no Spark deps, usable from Catalyst expressions / UDFs.
 */
sealed trait Host { def serialize: String }
final case class DomainHost(name: String) extends Host { def serialize: String = name }
final case class Ipv4Host(addr: Long) extends Host {
  def serialize: String =
    s"${(addr >> 24) & 0xff}.${(addr >> 16) & 0xff}.${(addr >> 8) & 0xff}.${addr & 0xff}"
}
final case class Ipv6Host(text: String) extends Host { def serialize: String = s"[$text]" }

final case class Url(
    scheme: String,
    username: String,
    password: String,
    host: Option[Host],
    port: Option[Int],
    // Right(segments) for hierarchical URLs, Left(opaque) for
    // cannot-be-a-base URLs (e.g. mailto:someone)
    path: Either[String, Vector[String]],
    query: Option[String],
    fragment: Option[String]
) {
  def domain: Option[String] = host.collect { case DomainHost(d) => d }

  def withoutFragment: Url = copy(fragment = None)

  def pathString: String = path match {
    case Left(opaque) => opaque
    case Right(segs)  => if (segs.isEmpty) "" else segs.mkString("/", "/", "")
  }

  /** Canonical serialization — the url-crate `as_str` equivalent. */
  def serialize: String = {
    val sb = new StringBuilder(scheme).append(':')
    host match {
      case Some(h) =>
        sb.append("//")
        if (username.nonEmpty || password.nonEmpty) {
          sb.append(username)
          if (password.nonEmpty) sb.append(':').append(password)
          sb.append('@')
        }
        sb.append(h.serialize)
        port.foreach(p => sb.append(':').append(p))
      case None =>
        if (path.isRight) sb.append("//") // hierarchical but host-less (file:///)
    }
    sb.append(pathString)
    query.foreach(q => sb.append('?').append(q))
    fragment.foreach(f => sb.append('#').append(f))
    sb.toString
  }

  def join(input: String): Either[String, Url] = UrlKit.parseWithBase(input, Some(this))
}

object UrlKit {
  private val specialPorts: Map[String, Int] =
    Map("http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)
  def isSpecial(scheme: String): Boolean = specialPorts.contains(scheme) || scheme == "file"
  def defaultPort(scheme: String): Option[Int] = specialPorts.get(scheme)

  def parse(input: String): Either[String, Url] = parseWithBase(input, None)

  // ---- percent-encode sets (WHATWG) -------------------------------------
  @inline private def inFragmentSet(c: Char): Boolean =
    c < 0x21 || c > 0x7e || c == '"' || c == '<' || c == '>' || c == '`'
  @inline private def inPathSet(c: Char): Boolean =
    inFragmentSet(c) || c == '#' || c == '?' || c == '{' || c == '}'
  @inline private def inUserinfoSet(c: Char): Boolean =
    inPathSet(c) || c == '/' || c == ':' || c == ';' || c == '=' || c == '@' ||
      c == '[' || c == '\\' || c == ']' || c == '^' || c == '|'
  @inline private def inQuerySet(c: Char, special: Boolean): Boolean =
    c < 0x21 || c > 0x7e || c == '"' || c == '#' || c == '<' || c == '>' ||
      (special && c == '\'')

  private val hex = "0123456789ABCDEF"

  /** Percent-encode chars matching `set`; existing '%' passes through. */
  private def pctEncode(s: String, set: Char => Boolean): String = {
    val sb = new StringBuilder(s.length)
    s.foreach { c =>
      if (set(c)) {
        val bytes = c.toString.getBytes("UTF-8")
        bytes.foreach { b =>
          sb.append('%').append(hex((b >> 4) & 0xf)).append(hex(b & 0xf))
        }
      } else sb.append(c)
    }
    sb.toString
  }

  private def pctDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length + 0 && i + 2 <= s.length - 1 &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val bytes = c.toString.getBytes("UTF-8")
        out.write(bytes, 0, bytes.length)
        i += 1
      }
    }
    new String(out.toByteArray, "UTF-8")
  }
  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  // ---- host parsing ------------------------------------------------------
  private def parseHost(raw: String, special: Boolean): Either[String, Host] = {
    if (raw.isEmpty) return Left("empty host")
    if (raw.startsWith("[")) {
      if (!raw.endsWith("]")) return Left("invalid IPv6 address")
      return Right(Ipv6Host(raw.substring(1, raw.length - 1).toLowerCase(java.util.Locale.ROOT)))
    }
    val decoded = pctDecode(raw)
    val forbidden = "\u0000\t\n\r #/:?@[\\]<>^|"
    if (decoded.exists(forbidden.contains(_))) return Left("invalid domain character")
    // Non-ASCII hosts go through IDNA ToASCII (punycode), as the url crate
    // does via the idna crate (UTS-46); java.net.IDN implements the IDNA2003
    // subset, which coincides with UTS-46 transitional processing for
    // crawl-realistic hostnames (e.g. bücher.de → xn--bcher-kva.de).
    val ascii =
      if (decoded.forall(_ < 0x80)) decoded
      else
        try java.net.IDN.toASCII(decoded, java.net.IDN.ALLOW_UNASSIGNED)
        catch { case _: IllegalArgumentException => return Left("invalid international domain name") }
    val lower = ascii.toLowerCase(java.util.Locale.ROOT)
    if (endsInNumber(lower)) parseIpv4(lower)
    else Right(DomainHost(lower))
  }

  private def endsInNumber(host: String): Boolean = {
    val parts0 = host.split("\\.", -1)
    val parts = if (parts0.nonEmpty && parts0.last.isEmpty) parts0.dropRight(1) else parts0
    if (parts.isEmpty) return false
    val last = parts.last
    if (last.isEmpty) false
    else if (last.forall(_.isDigit)) true
    else (last.startsWith("0x") || last.startsWith("0X")) &&
      last.drop(2).forall(isHex)
  }

  private def parseIpv4(host: String): Either[String, Host] = {
    val parts0 = host.split("\\.", -1)
    val parts = if (parts0.nonEmpty && parts0.last.isEmpty) parts0.dropRight(1) else parts0
    if (parts.isEmpty || parts.length > 4) return Left("invalid IPv4 address")
    def parseNum(p: String): Option[Long] =
      try {
        if (p.isEmpty) None
        else if (p.startsWith("0x") || p.startsWith("0X")) {
          val d = p.drop(2)
          Some(if (d.isEmpty) 0L else java.lang.Long.parseLong(d, 16))
        } else if (p.length > 1 && p.startsWith("0")) Some(java.lang.Long.parseLong(p, 8))
        else Some(java.lang.Long.parseLong(p, 10))
      } catch { case _: NumberFormatException => None }
    val nums = parts.map(parseNum)
    if (nums.exists(_.isEmpty)) return Left("invalid IPv4 address")
    val vals = nums.map(_.get)
    val last = vals.last
    val heads = vals.dropRight(1)
    if (heads.exists(v => v < 0 || v > 255)) return Left("invalid IPv4 address")
    val maxLast = 1L << (8 * (5 - vals.length))
    if (last < 0 || last >= maxLast) return Left("invalid IPv4 address")
    var addr = last
    heads.zipWithIndex.foreach { case (v, i) => addr += v << (8 * (3 - i)) }
    Right(Ipv4Host(addr & 0xffffffffL))
  }

  // ---- path parsing ------------------------------------------------------
  private def isSingleDot(seg: String): Boolean =
    seg == "." || seg.equalsIgnoreCase("%2e")
  private def isDoubleDot(seg: String): Boolean = {
    val l = seg.toLowerCase(java.util.Locale.ROOT)
    l == ".." || l == ".%2e" || l == "%2e." || l == "%2e%2e"
  }

  /**
   * Consume `input` as a path (until end; query/fragment must already be
   * split off), applying dot-segment removal, appending to `segs0`.
   */
  private def parsePathInto(segs0: Vector[String], input: String, special: Boolean): Vector[String] = {
    var segs = segs0
    val raw = if (special) input.replace('\\', '/') else input
    val pieces = raw.split("/", -1)
    var i = 0
    while (i < pieces.length) {
      val piece = pieces(i)
      val isLast = i == pieces.length - 1
      if (isDoubleDot(piece)) {
        if (segs.nonEmpty) segs = segs.dropRight(1)
        if (isLast) segs = segs :+ ""
      } else if (isSingleDot(piece)) {
        if (isLast) segs = segs :+ ""
      } else {
        segs = segs :+ pctEncode(piece, inPathSet)
      }
      i += 1
    }
    segs
  }

  // ---- main parser ---------------------------------------------------------
  private def schemeOf(s: String): Option[(String, String)] = {
    if (s.isEmpty || !s.charAt(0).isLetter) return None
    var i = 1
    while (i < s.length && (s.charAt(i).isLetterOrDigit || "+-.".contains(s.charAt(i)))) i += 1
    if (i < s.length && s.charAt(i) == ':') Some((s.substring(0, i).toLowerCase(java.util.Locale.ROOT), s.substring(i + 1)))
    else None
  }

  private[urlkit] def parseWithBase(rawInput: String, base: Option[Url]): Either[String, Url] = {
    // strip leading/trailing C0-control-or-space; drop tabs/newlines inside
    var s = rawInput
    s = s.dropWhile(_ <= ' ')
    s = s.reverse.dropWhile(_ <= ' ').reverse
    s = s.filterNot(c => c == '\t' || c == '\n' || c == '\r')

    schemeOf(s) match {
      case Some((scheme, rest)) =>
        if (isSpecial(scheme)) {
          base match {
            case Some(b) if b.scheme == scheme && !rest.startsWith("//") =>
              // WHATWG "special relative or authority" — treat as relative
              parseRelative(rest, b)
            case _ =>
              // special authority ignore-slashes: skip any run of / and \
              val afterSlashes = rest.dropWhile(c => c == '/' || c == '\\')
              parseAfterAuthority(scheme, afterSlashes, special = true)
          }
        } else if (rest.startsWith("//")) {
          parseAfterAuthority(scheme, rest.drop(2), special = false)
        } else {
          // cannot-be-a-base (opaque path)
          val (beforeFrag, frag) = splitOnce(rest, '#')
          val (opaquePath, query) = splitOnce(beforeFrag, '?')
          Right(
            Url(scheme, "", "", None, None, Left(pctEncode(opaquePath, c => c < 0x21 || c > 0x7e)),
              query.map(q => pctEncode(q, inQuerySet(_, special = false))),
              frag.map(f => pctEncode(f, inFragmentSet)))
          )
        }
      case None =>
        base match {
          case None => Left("relative URL without a base")
          case Some(b) =>
            if (b.path.isLeft) {
              // only fragment allowed against a cannot-be-a-base URL
              if (s.startsWith("#"))
                Right(b.copy(fragment = Some(pctEncode(s.drop(1), inFragmentSet))))
              else Left("relative URL with a cannot-be-a-base base")
            } else if (s.startsWith("//") || (isSpecial(b.scheme) && s.startsWith("\\\\"))) {
              parseAfterAuthority(b.scheme, s.drop(2), isSpecial(b.scheme))
            } else parseRelative(s, b)
        }
    }
  }

  /** input has no scheme and no leading "//": resolve against base. */
  private def parseRelative(input: String, b: Url): Either[String, Url] = {
    val special = isSpecial(b.scheme)
    if (input.isEmpty) return Right(b.copy(fragment = None))
    val c0 = input.charAt(0)
    if (c0 == '#')
      return Right(b.copy(fragment = Some(pctEncode(input.drop(1), inFragmentSet))))
    val (beforeFrag, frag) = splitOnce(input, '#')
    val fragEnc = frag.map(pctEncode(_, inFragmentSet))
    if (beforeFrag.startsWith("?")) {
      return Right(b.copy(
        query = Some(pctEncode(beforeFrag.drop(1), inQuerySet(_, special))),
        fragment = fragEnc))
    }
    val (pathPart, query) = splitOnce(beforeFrag, '?')
    val queryEnc = query.map(pctEncode(_, inQuerySet(_, special)))
    if (pathPart.isEmpty) {
      // e.g. "?..#.." handled above; here input was only a fragment-less empty
      return Right(b.copy(query = queryEnc.orElse(b.query), fragment = fragEnc))
    }
    val baseSegs = b.path.getOrElse(Vector.empty)
    val startSegs =
      if (pathPart.charAt(0) == '/' || (special && pathPart.charAt(0) == '\\')) Vector.empty[String]
      else if (baseSegs.nonEmpty) baseSegs.dropRight(1)
      else Vector.empty[String]
    val rel =
      if (pathPart.charAt(0) == '/' || (special && pathPart.charAt(0) == '\\')) pathPart.substring(1)
      else pathPart
    var segs = parsePathInto(startSegs, rel, special)
    if (segs.isEmpty && b.host.isDefined) segs = Vector("")
    Right(b.copy(path = Right(segs), query = queryEnc, fragment = fragEnc))
  }

  /** Parse "authority + path + query + fragment" for a hierarchical URL. */
  private def parseAfterAuthority(scheme: String, s: String, special: Boolean): Either[String, Url] = {
    // authority runs to the first '/', '\' (special), '?' or '#'
    var i = 0
    while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?' && s.charAt(i) != '#' &&
      !(special && s.charAt(i) == '\\')) i += 1
    val authority = s.substring(0, i)
    val rest = s.substring(i)

    var username = ""
    var password = ""
    val atIdx = authority.lastIndexOf('@')
    val hostPort = if (atIdx >= 0) {
      val userinfo = authority.substring(0, atIdx)
      val (u, p) = splitOnce(userinfo, ':')
      username = pctEncode(u, inUserinfoSet)
      password = p.map(pctEncode(_, inUserinfoSet)).getOrElse("")
      authority.substring(atIdx + 1)
    } else authority

    // split host : port — careful with IPv6 brackets
    val (hostRaw, portRaw) =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close < 0) return Left("invalid IPv6 address")
        val h = hostPort.substring(0, close + 1)
        val after = hostPort.substring(close + 1)
        if (after.isEmpty) (h, None)
        else if (after.startsWith(":")) (h, Some(after.drop(1)))
        else return Left("invalid domain character")
      } else {
        val (h, p) = splitOnce(hostPort, ':')
        (h, p)
      }

    if (hostRaw.isEmpty && special) return Left("empty host")

    val host: Option[Host] =
      if (hostRaw.isEmpty) None
      else parseHost(hostRaw, special) match {
        case Left(e)  => return Left(e)
        case Right(h) => Some(h)
      }

    val port: Option[Int] = portRaw match {
      case None | Some("") => None
      case Some(p) =>
        if (!p.forall(_.isDigit)) return Left("invalid port number")
        val v = try p.toInt catch { case _: NumberFormatException => return Left("invalid port number") }
        if (v > 65535) return Left("invalid port number")
        if (defaultPort(scheme).contains(v)) None else Some(v)
    }

    val (beforeFrag, frag) = splitOnce(rest, '#')
    val (pathRaw, query) = splitOnce(beforeFrag, '?')
    val pathInput = if (pathRaw.startsWith("/") || pathRaw.startsWith("\\")) pathRaw.substring(1) else pathRaw
    var segs = parsePathInto(Vector.empty, pathInput, special)
    if (segs.isEmpty && (special || host.isDefined) && pathRaw.isEmpty) {
      // "https://example.com" → path "/"
      if (special) segs = Vector("")
    }
    Right(Url(scheme, username, password, host, port, Right(segs),
      query.map(q => pctEncode(q, inQuerySet(_, special))),
      frag.map(f => pctEncode(f, inFragmentSet))))
  }

  private def splitOnce(s: String, sep: Char): (String, Option[String]) = {
    val idx = s.indexOf(sep)
    if (idx < 0) (s, None) else (s.substring(0, idx), Some(s.substring(idx + 1)))
  }

  // ---- convenience string-level API (used by Spark UDFs) ------------------

  /** Canonicalize a URL string; null/None on parse failure. */
  def canonicalize(s: String): Option[String] = parse(s).toOption.map(_.serialize)

  /** Resolve `href` against `base`; None on failure (link is skipped). */
  def joinStr(base: String, href: String): Option[String] =
    parse(base).toOption.flatMap(b => b.join(href).toOption).map(_.serialize)

  /** url-crate `domain()`: None for IP hosts / host-less URLs / bad URLs. */
  def domainStr(s: String): Option[String] = parse(s).toOption.flatMap(_.domain)

  /** Frontier partition key: serialized host plus explicit port ("" for
    * host-less / unparseable urls) — the politeness grouping key. */
  def hostPortStr(s: String): String =
    parse(s).toOption.flatMap(u =>
      u.host.map(h => h.serialize + u.port.map(":" + _).getOrElse(""))).getOrElse("")

  /** Strip the fragment from an already-canonical URL string. */
  def stripFragmentStr(s: String): String = {
    val idx = s.indexOf('#')
    if (idx < 0) s else s.substring(0, idx)
  }

  /** Same-domain test with the reference's None==None quirk (P2/P5). */
  def sameDomain(a: String, b: String): Boolean =
    domainStr(a) == domainStr(b)
}

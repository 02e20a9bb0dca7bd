package graft.httpkit

import graft.urlkit.UrlKit
import java.nio.charset.StandardCharsets.UTF_8

/**
 * Raw-HTTP-response handling for the pages table contract (BASELINE.json
 * input_hint + FIXTURES.md): the `html: binary` column holds the full HTTP
 * response bytes — status line + headers + CRLF CRLF + body — as a
 * Common-Crawl WARC `response` record does, so status, Content-Type and
 * Location are recoverable per row.
 *
 * `classify` reproduces the reference's response classification
 * (/root/reference/src/http_client.rs:64-94):
 *   2xx + text/html essence        → Html(body)
 *   2xx + other content type       → OtherContent(full CT header value)
 *   2xx without Content-Type       → Error("No content type on OK response")
 *   3xx + Location                 → Redirect(status, url.join(location))
 *   3xx without Location           → Error("No Location header on redirect")
 *   anything else                  → ServerFailure(status, body)
 * plus the table-contract extension: URL absent from the table ≙ network
 * error → Error("Connection failed") (the message the reference's own
 * network-error fixture uses, crawler.rs:583-597).
 */
object HttpKit {

  /** Classification outcome — mirrors http_client.rs HttpResponse + Err. */
  final case class Classified(
      kind: String, // "html" | "other" | "redirect" | "failure" | "error"
      status: Option[Int],
      body: Option[String],
      contentType: Option[String],
      location: Option[String], // resolved absolute URL for redirects
      error: Option[String]
  )

  object Kind {
    val Html = "html"; val Other = "other"; val Redirect = "redirect"
    val Failure = "failure"; val Error = "error"
  }

  final case class RawResponse(status: Int, headers: Vector[(String, String)], body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def bodyString: String = new String(body, UTF_8)
  }

  /** Render a response to raw bytes (used by PagesGen fixtures). */
  def render(status: Int, reason: String, headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason).append("\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  def render(status: Int, headers: Seq[(String, String)], body: String): Array[Byte] =
    render(status, reasonFor(status), headers, body.getBytes(UTF_8))

  def reasonFor(status: Int): String = status match {
    case 200 => "OK"; case 301 => "Moved Permanently"; case 302 => "Found"
    case 303 => "See Other"; case 307 => "Temporary Redirect"; case 308 => "Permanent Redirect"
    case 400 => "Bad Request"; case 403 => "Forbidden"; case 404 => "Not Found"
    case 410 => "Gone"; case 429 => "Too Many Requests"
    case 500 => "Internal Server Error"; case 502 => "Bad Gateway"; case 503 => "Service Unavailable"
    case _   => "Unknown"
  }

  /** Parse raw response bytes; None if malformed. */
  def parseResponse(bytes: Array[Byte]): Option[RawResponse] = {
    if (bytes == null) return None
    // find header/body split: \r\n\r\n (tolerate \n\n)
    var split = -1
    var sepLen = 0
    var i = 0
    while (split < 0 && i < bytes.length - 1) {
      if (bytes(i) == '\r' && i + 3 < bytes.length && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') { split = i; sepLen = 4 }
      else if (bytes(i) == '\n' && bytes(i + 1) == '\n') { split = i; sepLen = 2 }
      i += 1
    }
    val (headBytes, body) =
      if (split < 0) (bytes, Array.emptyByteArray)
      else (bytes.slice(0, split), bytes.slice(split + sepLen, bytes.length))
    val head = new String(headBytes, UTF_8)
    val lines = head.split("\r?\n").toVector
    if (lines.isEmpty) return None
    val statusLine = lines.head
    // "HTTP/1.1 200 OK"
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val status = try parts(1).toInt catch { case _: NumberFormatException => return None }
    val headers = lines.tail.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None else Some((l.substring(0, c).trim, l.substring(c + 1).trim))
    }
    Some(RawResponse(status, headers, body))
  }

  /** mime `essence_str` (http_client.rs:67-73): type/subtype, trimmed, lowercased. */
  def essence(contentType: String): Option[String] = {
    val base = contentType.split(";", 2)(0).trim.toLowerCase(java.util.Locale.ROOT)
    // a mime must parse as type "/" subtype (mime crate `.parse()?`)
    val slash = base.indexOf('/')
    if (slash <= 0 || slash == base.length - 1) None
    else if (base.exists(c => c <= ' ' || c == '(' || c == ')' || c == '<' || c == '>' || c == '@' ||
      c == ',' || c == ':' || c == '\\' || c == '"' || c == '[' || c == ']' || c == '?' || c == '=')) None
    else Some(base)
  }

  /** Classify a fetch outcome. `bytes == null` means "no row in the table". */
  def classify(url: String, bytes: Array[Byte]): Classified = {
    if (bytes == null)
      return Classified(Kind.Error, None, None, None, None, Some("Connection failed"))
    parseResponse(bytes) match {
      case None =>
        Classified(Kind.Error, None, None, None, None, Some("Malformed HTTP response"))
      case Some(r) =>
        if (r.status >= 200 && r.status < 300) {
          r.header("Content-Type") match {
            case None =>
              Classified(Kind.Error, None, None, None, None, Some("No content type on OK response"))
            case Some(ct) =>
              essence(ct) match {
                case None =>
                  Classified(Kind.Error, None, None, None, None, Some(s"invalid mime type: $ct"))
                case Some(e) if e == "text/html" =>
                  Classified(Kind.Html, Some(r.status), Some(r.bodyString), Some(ct), None, None)
                case Some(_) =>
                  Classified(Kind.Other, Some(r.status), None, Some(ct), None, None)
              }
          }
        } else if (r.status >= 300 && r.status < 400) {
          r.header("Location") match {
            case None =>
              Classified(Kind.Error, None, None, None, None, Some("No Location header on redirect"))
            case Some(loc) =>
              UrlKit.joinStr(url, loc) match {
                case Some(abs) =>
                  Classified(Kind.Redirect, Some(r.status), None, None, Some(abs), None)
                case None =>
                  Classified(Kind.Error, None, None, None, None, Some(s"invalid redirect Location: $loc"))
              }
          }
        } else {
          Classified(Kind.Failure, Some(r.status), Some(r.bodyString), None, None, None)
        }
    }
  }
}

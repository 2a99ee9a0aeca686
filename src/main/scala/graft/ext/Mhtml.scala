package graft.ext

import org.apache.spark.unsafe.types.UTF8String

/** MHTML web-archive extraction — the single-file page snapshot format
  * browsers emit ("Save as MHTML" / Chrome Blink snapshots) and crawls
  * of shared documents are full of. An MHTML file IS a MIME message
  * (`multipart/related`), so the walk is [[Mail.parseEml]]; this arm
  * adds the web-archive semantics on top:
  *
  *   - the ROOT document is the first `text/html` part in tree order
  *     (RFC 2557 §4.1's default when no `start` parameter is given —
  *     and browsers place the root first unconditionally);
  *   - every part's `Content-Location` is its original URL — the
  *     resource inventory (images/CSS/scripts) keyed by it;
  *   - page text is the root HTML through the same
  *     [[graft.functions.HtmlText]] pass the WET envelope uses.
  *
  * Scale shape: one archive = one payload row, map-only on executors.
  */
object Mhtml {

  /** One saved resource: original URL, media type, decoded size. */
  final case class Resource(location: String, contentType: String, size: Int)

  /** Parsed archive: page title (Subject header — what browsers store
    * there), the root document's URL, its extracted text, and the
    * non-root resource inventory in tree order.
    */
  final case class Doc(title: String, rootLocation: String, text: String,
      resources: Vector[Resource])

  /** None when the payload has no HTML root part (not an MHTML). */
  def parse(b: Array[Byte]): Option[Doc] = {
    val m = Mail.parseEml(b)
    val root = m.parts.find(_.contentType == "text/html")
      .getOrElse(return None)
    val html = new String(root.body,
      Mail.cs(if (root.charset == "us-ascii") "UTF-8" else root.charset))
    val text = graft.functions.HtmlText.compute(
      UTF8String.fromString(html)).toString
    val resources = m.parts.filter(_ ne root).flatMap { p =>
      p.location.map(loc => Resource(loc, p.contentType, p.body.length))
    }
    Some(Doc(m.subject, root.location.getOrElse(""), text, resources))
  }

  /** Deterministic Chrome-shaped builder for certificates/specs:
    * quoted-printable HTML root plus binary resources, each with its
    * Content-Location.
    */
  private[graft] def build(title: String, rootUrl: String, html: String,
      resources: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val b64 = java.util.Base64.getMimeEncoder(76, Array('\r', '\n'))
    val sb = new StringBuilder
    sb.append("From: <Saved by Blink>\r\n")
    sb.append("Snapshot-Content-Location: ").append(rootUrl).append("\r\n")
    sb.append("Subject: ").append(title).append("\r\n")
    sb.append("Date: Thu, 15 Jan 2026 10:00:00 -0000\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    sb.append("Content-Type: multipart/related;\r\n\ttype=\"text/html\";\r\n")
    sb.append("\tboundary=\"----MultipartBoundary--graft----\"\r\n\r\n")
    val bnd = "------MultipartBoundary--graft----"
    sb.append(bnd).append("\r\n")
    sb.append("Content-Type: text/html\r\n")
    sb.append("Content-ID: <frame-0@mhtml.blink>\r\n")
    sb.append("Content-Transfer-Encoding: quoted-printable\r\n")
    sb.append("Content-Location: ").append(rootUrl).append("\r\n\r\n")
    sb.append(Mail.encodeQp(html)).append("\r\n\r\n")
    for ((url, ct, bytes) <- resources) {
      sb.append(bnd).append("\r\n")
      sb.append("Content-Type: ").append(ct).append("\r\n")
      sb.append("Content-Transfer-Encoding: base64\r\n")
      sb.append("Content-Location: ").append(url).append("\r\n\r\n")
      sb.append(b64.encodeToString(bytes)).append("\r\n\r\n")
    }
    sb.append(bnd).append("--\r\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

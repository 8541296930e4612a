package graft.sources

/** SVG and plain-TXT document decoding (r19 — VERDICT r18 Missing #1,
  * the last containers in PyMuPDF's document-open envelope where the
  * reference extracts text and graft dropped the payload: fitz opens
  * `.svg` and `.txt` alongside PDF/XPS/EPUB/MOBI/FB2/CBZ — ref
  * `downloader.py:385` hands fitz ANY payload and `extractor.py:136`
  * yields per-page XHTML).
  *
  *   - SVG: a one-page vector document; the extractable text is the
  *     content of its `<text>` elements (including nested `<tspan>`
  *     runs), surfaced as one XHTML page — the same page shape the
  *     PDF decoder emits. Root-element detection (a real XML-prologue
  *     walk, not a substring probe) keeps HTML that merely EMBEDS an
  *     `<svg>` island out of this class.
  *   - TXT: paginated plain text. PyMuPDF reflows to a layout-derived
  *     page count; a reflow is not reproducible engine output, so the
  *     page contract here is deterministic: [[PlainDocs.LinesPerPage]]
  *     (66 — the classic line-printer page) lines per page, split on
  *     any of CRLF/CR/LF, one trailing terminator not counted as an
  *     extra line (the same documented-contract discipline as FB2
  *     sections and MOBI pagebreak markers).
  *
  * Detection is strict so the class never claims binary payloads: TXT
  * requires a STRICT UTF-8 decode (malformed sequences reject, never
  * U+FFFD-substitute) and no control characters beyond tab/newline/
  * carriage-return/form-feed. Torn SVG (no closing root tag) yields
  * None — dropped, never fabricated. */
object PlainDocs {

  /** Deterministic TXT page contract: lines per page. */
  val LinesPerPage = 66

  private val MaxTextBytes = 64 * 1024 * 1024

  /** The root element name of an XML-ish payload head (prologue —
    * BOM, `<?…?>`, comments, `<!DOCTYPE …>` — skipped), or None. */
  private def rootElement(head: String): Option[String] = {
    var i = 0
    while (i < head.length) {
      val c = head.charAt(i)
      if (c == '\uFEFF' || c.isWhitespace) i += 1
      else if (c != '<') return None
      else if (head.startsWith("<?", i)) {
        val e = head.indexOf("?>", i); if (e < 0) return None; i = e + 2
      } else if (head.startsWith("<!--", i)) {
        val e = head.indexOf("-->", i); if (e < 0) return None; i = e + 3
      } else if (head.startsWith("<!", i)) {
        // a DOCTYPE may carry an internal subset — a '>' inside its
        // [...] does not end the declaration
        var j = i + 2; var depth = 0; var end = -1
        while (j < head.length && end < 0) {
          head.charAt(j) match {
            case '[' => depth += 1
            case ']' => if (depth > 0) depth -= 1
            case '>' => if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end < 0) return None
        i = end + 1
      } else {
        var j = i + 1
        while (j < head.length &&
               (head.charAt(j).isLetterOrDigit || head.charAt(j) == ':' ||
                head.charAt(j) == '-' || head.charAt(j) == '_' ||
                head.charAt(j) == '.')) j += 1
        if (j == i + 1) return None // "<" followed by no name
        return Some(head.substring(i + 1, j))
      }
    }
    None
  }

  /** True when the payload's ROOT element is `<svg>` (any namespace
    * prefix) — the PyMuPDF `.svg` document class. The prologue scan
    * is bounded to the first [[HeadWindow]] bytes (a documented
    * detection bound — an SVG whose comments/DOCTYPE push the root
    * element past it classifies as its printable-text fallback). */
  def isSvg(p: Array[Byte]): Boolean = {
    if (p == null || p.length < 5) return false
    val head = new String(p, 0, math.min(p.length, HeadWindow),
      java.nio.charset.StandardCharsets.UTF_8)
    rootElement(head).exists(n => n == "svg" || n.endsWith(":svg"))
  }

  /** Root-element detection window (bytes of prologue scanned). */
  private val HeadWindow = 8192

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The comment-stripped XML of a detected SVG, or None — the one
    * full-payload decode both the text scan and the image scan share.
    * Comments are stripped before any scan — a commented-out `<text>`
    * or `<image>` element must not contribute (the fb2Pages rule);
    * a torn document (no closing root tag) yields None — dropped,
    * never fabricated. */
  private def svgXml(p: Array[Byte]): Option[String] = {
    if (!isSvg(p)) return None
    val xml = new String(p, java.nio.charset.StandardCharsets.UTF_8)
      .replaceAll("(?s)<!--.*?-->", " ")
    if ("""</(?:\w+:)?svg\s*>""".r.findFirstIn(xml).isEmpty) None
    else Some(xml)
  }

  /** One XHTML page whose text is the SVG's `<text>` content (child
    * markup such as `<tspan>` stripped, entities unescaped, runs
    * joined by single spaces). None when the document is torn. */
  private[graft] def svgPages(p: Array[Byte]): Option[Seq[String]] =
    svgXml(p).map(pageFromXml)

  private def pageFromXml(xml: String): Seq[String] = {
    val runs = """(?s)<(?:\w+:)?text\b[^>]*>(.*?)</(?:\w+:)?text>""".r
      .findAllMatchIn(xml).map { m =>
        Epub.xmlUnescape(m.group(1).replaceAll("<[^>]*>", " "))
          .replaceAll("\\s+", " ").trim
      }.filter(_.nonEmpty).toSeq
    Seq(s"<div><p>${xmlEscape(runs.mkString(" "))}</p></div>")
  }

  /** [[svgPages]] with the page's embedded raster payloads (r19 —
    * the q402 parity the other document classes have): SVG embeds
    * rasters as `<image>` elements whose `href`/`xlink:href` is a
    * base64 data URI (a standalone `.svg` has no archive to resolve
    * relative refs against — non-data refs and unparseable base64 are
    * skipped; an absent illustration must not fail the text). */
  private[graft] def svgPagesWithImages(p: Array[Byte])
      : Option[Seq[(String, Seq[Array[Byte]])]] =
    svgXml(p).map { xml =>
      val imgs = """<(?:\w+:)?image\b[^>]*?\b(?:\w+:)?href="data:image/[^;"]+;base64,([^"]*)"""".r
        .findAllMatchIn(xml).flatMap { m =>
          try Some(java.util.Base64.getMimeDecoder.decode(m.group(1).trim))
          catch { case _: IllegalArgumentException => None }
        }.toSeq
      pageFromXml(xml).map(pg => (pg, imgs))
    }

  /** True when the payload is printable text: a STRICT UTF-8 decode
    * succeeds and no control characters beyond \t \n \r \f appear.
    * (Binary junk, torn multibyte sequences, and NUL-bearing buffers
    * all reject — this class must never claim a damaged PDF.) */
  def isTxt(p: Array[Byte]): Boolean =
    p != null && p.nonEmpty && p.length <= MaxTextBytes && decodeTxt(p).isDefined

  private def decodeTxt(p: Array[Byte]): Option[String] = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(p)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isISOControl(c) &&
          c != '\t' && c != '\n' && c != '\r' && c != '\f') return None
      i += 1
    }
    Some(s)
  }

  /** Paginated plain text: [[LinesPerPage]] lines per page, one
    * `<p>` per line (the reference-shaped XHTML page the rest of the
    * pipeline consumes). None when the payload is not printable text —
    * including null, EMPTY (a zero-byte body is not a one-page
    * document; dropped, never fabricated), and over-[[MaxTextBytes]]
    * payloads (the route must not materialize a multi-GB string). */
  private[graft] def txtPages(p: Array[Byte]): Option[Seq[String]] = {
    if (p == null || p.isEmpty || p.length > MaxTextBytes) return None
    decodeTxt(p).map { text =>
      val raw = text.split("\r\n|\r|\n", -1)
      // a single trailing terminator ends the last line, it does not
      // open an extra empty one
      val lines = if (raw.length > 1 && raw.last.isEmpty) raw.init else raw
      lines.grouped(LinesPerPage).map { page =>
        page.map(l => s"<p>${xmlEscape(l)}</p>").mkString("<div>", "", "</div>")
      }.toSeq
    }
  }
}

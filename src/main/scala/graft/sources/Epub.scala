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

  /** Spine-ordered chapter XHTML of an EPUB, or None when the OCF/OPF
    * chain tears (missing container.xml, unresolvable OPF, empty
    * spine, dangling idref/href). */
  private[graft] def epubPages(entries: Map[String, Array[Byte]])
      : Option[Seq[String]] = {
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
      val path = if (href.startsWith("/")) href.drop(1) else opfDir + href
      utf8(entries.getOrElse(path, return None))
    }
    Some(pages)
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
  * container chain resolves, CBZ when the archive is image entries.
  * Anything else → Left (the caller's router falls back). */
final case class EpubDecoder() extends PageDecoder {
  override def decode(payload: Array[Byte]): Either[String, Seq[String]] =
    Epub.zipEntries(payload) match {
      case None => Left("cannot open document: not a readable ZIP container")
      case Some(entries) =>
        Epub.epubPages(entries) match {
          case Some(pages) => Right(pages)
          case None =>
            Epub.cbzPages(entries) match {
              case Some(pages) => Right(pages.map(_._1))
              case None => Left("cannot open document: ZIP is neither EPUB nor CBZ")
            }
        }
    }

  override def decodeWithImages(payload: Array[Byte])
      : Either[String, Seq[(String, Seq[Array[Byte]])]] =
    Epub.zipEntries(payload) match {
      case None => Left("cannot open document: not a readable ZIP container")
      case Some(entries) =>
        Epub.epubPages(entries) match {
          case Some(pages) => Right(pages.map(p => (p, Seq.empty[Array[Byte]])))
          case None =>
            Epub.cbzPages(entries) match {
              case Some(pages) => Right(pages.map { case (x, b) => (x, Seq(b)) })
              case None => Left("cannot open document: ZIP is neither EPUB nor CBZ")
            }
        }
    }
}

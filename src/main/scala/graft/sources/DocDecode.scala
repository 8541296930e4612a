package graft.sources

/** Document (PDF) page decoding — the reference opens payload bytes with
  * PyMuPDF and renders each page to XHTML
  * (`/root/reference/doc2dataset/downloader.py:385`,
  * `extractor.py:136-137`).
  *
  * No PDF library ships in this container (zero-egress, and none in
  * /opt/spark/jars), so the decode step is isolated behind [[PageDecoder]]
  * (SURVEY §7.4: "isolate behind an interface with a plain-text fallback
  * for tests"). The Spark-side plumbing — binary payload column, per-page
  * explode, page schema, filters — is real and tested against
  * [[FakePdfDecoder]], a deterministic stand-in; a production deployment
  * plugs a real PDF implementation into the same trait.
  */
trait PageDecoder extends Serializable {
  /** payload bytes → pages as XHTML strings (one per page), or Left(error)
    * when the document cannot be opened (→ status=failed_to_extract). */
  def decode(payload: Array[Byte]): Either[String, Seq[String]]

  /** Per-page SVG drawing extraction (ref `extractor.py:76-77`,
    * `page.get_svg_image()`); default empty. */
  def drawings(payload: Array[Byte], pageNo: Int): String = ""

  /** One-pass decode + per-page drawings. Default composes [[decode]]
    * and [[drawings]] (re-walking the payload per page); decoders with
    * expensive payload parsing override to parse once. */
  def decodeWithDrawings(payload: Array[Byte]): Either[String, Seq[(String, String)]] =
    decode(payload).map(ps =>
      ps.zipWithIndex.map { case (p, i) => (p, drawings(payload, i)) })

  /** One-pass decode + per-page PAINTED-IMAGE payloads (r15 — the
    * reference's `save_figures` surface: each payload is a complete
    * JPEG or PNG consumable by the multimodal codec column). Default:
    * no payloads — only decoders that can truly extract image bytes
    * override (fabricating bytes for a real document would violate the
    * fail-closed policy). */
  def decodeWithImages(payload: Array[Byte])
      : Either[String, Seq[(String, Seq[Array[Byte]])]] =
    decode(payload).map(_.map(p => (p, Seq.empty[Array[Byte]])))
}

/** Deterministic fake decoder: interprets the payload as UTF-8 text and
  * splits into fixed-size "pages", emitting reference-shaped XHTML
  * (`<div><p>...</p></div>` with an `<img>` every third page). Page count
  * and content are pure functions of the payload — stable under Spark
  * task retries, suitable for golden tests.
  */
final case class FakePdfDecoder(wordsPerPage: Int = 40) extends PageDecoder {
  override def decode(payload: Array[Byte]): Either[String, Seq[String]] = {
    if (payload == null) return Left("cannot open document: null payload")
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    if (text.isEmpty) return Left("cannot open document: empty payload")
    val words = text.split("\\s+").filter(_.nonEmpty)
    val pages = words.grouped(wordsPerPage).zipWithIndex.map { case (ws, i) =>
      val img =
        if (i % 3 == 2)
          s"""<img width="${100 + (ws.length % 7) * 50}" height="${80 + (ws.length % 5) * 60}" src="fake_$i.png" alt=""/>"""
        else ""
      s"<div><p>${ws.mkString(" ")}</p>$img</div>"
    }.toSeq
    Right(pages)
  }

  override def drawings(payload: Array[Byte], pageNo: Int): String =
    s"""<svg width="10" height="10"><rect x="$pageNo"/></svg>"""
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AutoPdfDecoder, FakePdfDecoder, MiniPdf, MiniPdfDecoder}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Real-PDF decoding against hand-built documents: every input here is a
  * genuine PDF assembled byte-by-byte (Flate streams via
  * java.util.zip.Deflater), so the decoder is exercised on the real wire
  * format, not on a mock of itself. */
class MiniPdfSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  /** Assemble a PDF: objects may be supplied in ANY order; `pageKids`
    * fixes the page-tree order. Content streams optionally Flate'd. */
  private def buildPdf(contents: Map[Int, String], pageObjs: Seq[(Int, Seq[Int])],
                       kidsOrder: Seq[Int], flate: Boolean,
                       objOrder: Option[Seq[Int]] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val kids = kidsOrder.map(n => s"$n 0 R").mkString(" ")
    val objects = scala.collection.mutable.LinkedHashMap[Int, () => Unit]()
    objects(1) = () => w(s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objects(2) = () => w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count ${kidsOrder.size} >>\nendobj\n")
    for ((num, contentRefs) <- pageObjs) {
      val c =
        if (contentRefs.size == 1) s"/Contents ${contentRefs.head} 0 R"
        else s"/Contents [ ${contentRefs.map(r => s"$r 0 R").mkString(" ")} ]"
      objects(num) = () => w(s"$num 0 obj\n<< /Type /Page /Parent 2 0 R $c >>\nendobj\n")
    }
    for ((num, text) <- contents) {
      objects(num) = () => {
        val raw = text.getBytes(ISO_8859_1)
        val data = if (flate) deflate(raw) else raw
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
        bos.write(data)
        w("\nendstream\nendobj\n")
      }
    }
    for (num <- objOrder.getOrElse(objects.keys.toSeq)) objects(num)()
    w("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("single-page uncompressed Tj extracts the text") {
    val pdf = buildPdf(
      contents = Map(4 -> "BT /F1 12 Tf 72 720 Td (Hello world from PDF) Tj ET"),
      pageObjs = Seq(3 -> Seq(4)), kidsOrder = Seq(3), flate = false)
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages == Seq("<div><p>Hello world from PDF</p></div>"))
  }

  test("multi-page Flate with TJ arrays, escapes, octal, and hex strings") {
    val p1 = "BT (Para \\(one\\) with \\134 backslash) Tj ET"
    val p2 = "BT [(Second ) (page ) (glued)] TJ T* (next line \\101\\102) Tj ET"
    val p3 = "BT <48656C6C6F20686578> Tj ET"
    val pdf = buildPdf(
      contents = Map(10 -> p1, 11 -> p2, 12 -> p3),
      pageObjs = Seq(5 -> Seq(10), 6 -> Seq(11), 7 -> Seq(12)),
      kidsOrder = Seq(5, 6, 7), flate = true)
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages(0) == "<div><p>Para (one) with \\ backslash</p></div>")
    assert(pages(1) == "<div><p>Second page glued next line AB</p></div>")
    assert(pages(2) == "<div><p>Hello hex</p></div>")
  }

  test("page ORDER follows the Kids tree, not document object order") {
    // objects written back-to-front: content for page B first, etc.
    val pdf = buildPdf(
      contents = Map(20 -> "BT (FIRST) Tj ET", 21 -> "BT (SECOND) Tj ET"),
      pageObjs = Seq(8 -> Seq(20), 9 -> Seq(21)),
      kidsOrder = Seq(8, 9), flate = false,
      objOrder = Some(Seq(21, 9, 20, 8, 2, 1)))
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages.map(p => p.contains("FIRST") -> p.contains("SECOND")) ==
      Seq(true -> false, false -> true))
  }

  test("/Contents array concatenates streams in order") {
    val pdf = buildPdf(
      contents = Map(30 -> "BT (alpha ) Tj ET", 31 -> "BT (beta) Tj ET"),
      pageObjs = Seq(3 -> Seq(30, 31)), kidsOrder = Seq(3), flate = true)
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages == Seq("<div><p>alpha beta</p></div>"))
  }

  test("fails CLOSED on junk, truncation, and non-PDF payloads") {
    assert(MiniPdfDecoder().decode(null).isLeft)
    assert(MiniPdfDecoder().decode("not a pdf at all".getBytes).isLeft)
    assert(MiniPdfDecoder().decode("%PDF-1.4\ngarbage with no objects".getBytes).isLeft)
    // a valid header + objects but no page tree and no /Type /Page
    val noPages = "%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n".getBytes(ISO_8859_1)
    assert(MiniPdfDecoder().decode(noPages).isLeft)
  }

  test("AutoPdfDecoder routes real PDFs to MiniPdf, printable text to " +
       "the TXT class (r19), and binary junk to the stub") {
    val pdf = buildPdf(
      contents = Map(4 -> "BT (routed) Tj ET"),
      pageObjs = Seq(3 -> Seq(4)), kidsOrder = Seq(3), flate = false)
    val auto = AutoPdfDecoder()
    assert(auto.decode(pdf) == Right(Seq("<div><p>routed</p></div>")))
    // r19: printable text is a PyMuPDF document class of its own now —
    // one 66-line page, one <p> per line
    val textPayload = "plain words for the txt class".getBytes("UTF-8")
    assert(auto.decode(textPayload) ==
      Right(Seq("<div><p>plain words for the txt class</p></div>")))
    // binary junk (invalid UTF-8) still rides the fallback
    val junk = Array[Byte](0x41, 0x20, 0xC3.toByte, 0x28, 0x42) // torn UTF-8
    assert(auto.decode(junk) == FakePdfDecoder().decode(junk))
  }

  // ------------------------------------------------------------------
  // round-11 depth extensions: modern-PDF coverage
  // ------------------------------------------------------------------

  /** Assemble a PDF from raw (num, dict, streamBytes) objects plus an
    * arbitrary trailer/footer — for the PDF 1.5-style tests the classic
    * builder can't express. */
  private def rawPdf(objects: Seq[(Int, String, Option[Array[Byte]])],
                     footer: String = "trailer\n<< /Root 1 0 R >>\n%%EOF\n"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    for ((num, dict, stream) <- objects) {
      w(s"$num 0 obj\n$dict\n")
      stream.foreach { data =>
        w("stream\n"); bos.write(data); w("\nendstream\n")
      }
      w("endobj\n")
    }
    w(footer)
    bos.toByteArray
  }

  private def a85encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var t = 0L
      var k = 0
      while (k < 4) { t = (t << 8) | (if (i + k < data.length) data(i + k) & 0xff else 0); k += 1 }
      if (n == 4 && t == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var v = t
        var j = 4
        while (j >= 0) { cs(j) = ((v % 85) + 33).toChar; v /= 85; j -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  test("PDF 1.5 object streams: page tree hidden in /Type /ObjStm decodes") {
    // catalog (2), pages (3) and page (6) live INSIDE a Flate'd ObjStm;
    // /Root comes from an xref-stream dict, no `trailer` keyword at all
    val inner = Seq(
      2 -> "<< /Type /Catalog /Pages 3 0 R >>",
      3 -> "<< /Type /Pages /Kids [ 6 0 R ] /Count 1 >>",
      6 -> "<< /Type /Page /Parent 3 0 R /Contents 4 0 R >>")
    val bodies = inner.map(_._2)
    val offsets = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = inner.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString("\n") + "\n").getBytes(ISO_8859_1)
    val packed = deflate(payload)
    val content = "BT (from an object stream) Tj ET"
    val pdf = rawPdf(Seq(
      (1, s"<< /Type /ObjStm /N 3 /First ${header.length} /Filter /FlateDecode /Length ${packed.length} >>", Some(packed)),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Type /XRef /Root 2 0 R /W [ 1 2 1 ] /Length 0 >>", Some(Array.emptyByteArray))),
      footer = "startxref\n0\n%%EOF\n")
    assert(MiniPdfDecoder().decode(pdf) ==
      Right(Seq("<div><p>from an object stream</p></div>")))
  }

  test("filter chains: ASCII85+Flate, ASCIIHex, RunLength, PNG predictor") {
    def onePage(filter: String, data: Array[Byte], parms: String = ""): Array[Byte] =
      rawPdf(Seq(
        (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
        (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
        (4, s"<< /Filter $filter$parms /Length ${data.length} >>", Some(data))))
    // chain: stream = a85(deflate(text)); decode order A85 -> Flate
    val t1 = "BT (chained filters) Tj ET"
    assert(MiniPdfDecoder().decode(onePage("[ /ASCII85Decode /FlateDecode ]",
      a85encode(deflate(t1.getBytes(ISO_8859_1))))) ==
      Right(Seq("<div><p>chained filters</p></div>")))
    // ASCIIHex with whitespace and terminator
    val t2 = "BT (hex filter) Tj ET"
    val hex = t2.getBytes(ISO_8859_1).map(b => f"${b & 0xff}%02X").mkString(" ") + " >"
    assert(MiniPdfDecoder().decode(onePage("/ASCIIHexDecode", hex.getBytes(ISO_8859_1))) ==
      Right(Seq("<div><p>hex filter</p></div>")))
    // RunLength: literal chunks + EOD
    val t3 = "BT (rle) Tj ET".getBytes(ISO_8859_1)
    val rle = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < t3.length) {
      val n = math.min(128, t3.length - i)
      rle.write(n - 1); rle.write(t3, i, n); i += n
    }
    rle.write(128)
    assert(MiniPdfDecoder().decode(onePage("/RunLengthDecode", rle.toByteArray)) ==
      Right(Seq("<div><p>rle</p></div>")))
    // Flate + PNG Up predictor (12), Columns 10
    val cols = 10
    val raw0 = "BT (predicted row data) Tj ET".getBytes(ISO_8859_1)
    val pad = (cols - raw0.length % cols) % cols
    val raw = raw0 ++ Array.fill(pad)(' '.toByte)
    val enc = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < raw.length / cols) {
      enc.write(2) // Up
      var c = 0
      while (c < cols) {
        val prev = if (r > 0) raw((r - 1) * cols + c) & 0xff else 0
        enc.write((raw(r * cols + c) & 0xff) - prev & 0xff)
        c += 1
      }
      r += 1
    }
    assert(MiniPdfDecoder().decode(onePage("/FlateDecode", deflate(enc.toByteArray),
      s" /DecodeParms << /Predictor 12 /Columns $cols >>")) ==
      Right(Seq("<div><p>predicted row data</p></div>")))
  }

  test("Type0 font text via ToUnicode CMap; Identity-H without map drops cleanly") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0001> <0048>
        |<0002> <00690021>
        |<0003> <0020>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0041>
        |<0020> <0021> [<0058> <00590059>]
        |endbfrange
        |endcmap
        |end""".stripMargin.getBytes(ISO_8859_1)
    // bfchar: 0001->H, 0002->i!, 0003->space; bfrange: 0010..0012->A,B,C;
    // array form: 0020->X, 0021->YY
    val content = "BT /F1 12 Tf <00010002> Tj <0003> Tj <001000110012> Tj " +
      "/F2 12 Tf <00010002> Tj /F1 12 Tf <00200021> Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 7 0 R /F2 9 0 R >> >> /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (7, "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 8 0 R >>", None),
      (8, s"<< /Length ${cmap.length} >>", Some(cmap)),
      (9, "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>", None)))
    // F2 (no ToUnicode) must contribute NOTHING — not glyph-id garbage
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages == Seq("<div><p>Hi! ABCXYY</p></div>"))
  }

  test("resources inherited from the Pages parent node resolve fonts") {
    val cmap = "1 beginbfchar <0001> <005A> endbfchar".getBytes(ISO_8859_1)
    val content = "BT /F1 1 Tf <0001> Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 /Resources << /Font << /F1 7 0 R >> >> >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None), // no /Resources here
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (7, "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 8 0 R >>", None),
      (8, s"<< /Length ${cmap.length} >>", Some(cmap))))
    assert(MiniPdfDecoder().decode(pdf) == Right(Seq("<div><p>Z</p></div>")))
  }

  test("UTF-16BE literal strings and TJ kerning word spaces") {
    val utf16 = Array[Byte]('B', 'T', ' ', '(', 0xFE.toByte, 0xFF.toByte,
      0x00, 'H', 0x00, 'i', ')', ' ', 'T', 'j', ' ', 'E', 'T')
    val kern = "BT [(Hello) -250 (world) -20 (!)] TJ ET"
    val full = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R 5 0 R ] /Count 2 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 10 0 R >>", None),
      (5, "<< /Type /Page /Parent 2 0 R /Contents 11 0 R >>", None),
      (10, s"<< /Length ${utf16.length} >>", Some(utf16)),
      (11, s"<< /Length ${kern.length} >>", Some(kern.getBytes(ISO_8859_1)))))
    val Right(pages) = MiniPdfDecoder().decode(full)
    assert(pages(0) == "<div><p>Hi</p></div>")
    // -250 (beyond the word-space threshold) breaks; -20 (kerning) glues
    assert(pages(1) == "<div><p>Hello world!</p></div>")
  }

  test("encrypted PDFs fail CLOSED with a descriptive error") {
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, "<< /Length 20 >>", Some("BT (secret) Tj ET".getBytes(ISO_8859_1)))),
      footer = "trailer\n<< /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF\n")
    val res = MiniPdfDecoder().decode(pdf)
    assert(res.isLeft && res.swap.toOption.get.contains("encrypted"))
  }

  test("end-to-end: real PDFs through DocPipeline.decodePages") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pdfA = buildPdf(Map(4 -> "BT (doc A text) Tj ET"),
      Seq(3 -> Seq(4)), Seq(3), flate = true)
    val pdfB = buildPdf(Map(10 -> "BT (B one) Tj ET", 11 -> "BT (B two) Tj ET"),
      Seq(5 -> Seq(10), 6 -> Seq(11)), Seq(5, 6), flate = true)
    val df = Seq(("a", pdfA), ("b", pdfB), ("junk", "not a pdf".getBytes))
      .toDF("id", "payload")
    val out = graft.operators.DocPipeline
      .decodePages(df, AutoPdfDecoder(FakePdfDecoder(40)), "payload")
      .select(col("id"), col("pages"), col("decode_error"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getSeq[String](1)), Option(r.getString(2)))).toMap
    assert(out("a")._1.get == Seq("<div><p>doc A text</p></div>"))
    assert(out("b")._1.get == Seq("<div><p>B one</p></div>", "<div><p>B two</p></div>"))
    // junk payload routed to the FAKE decoder (deterministic pages, no error)
    assert(out("junk")._1.get.nonEmpty && out("junk")._2.isEmpty)
  }

  // ---- round-12 adversarial hardening ----------------------------------

  test("page-tree walk is linear on a repeated-ancestor /Kids bomb") {
    // /Pages node 2 lists ITSELF 12 times before the real page: without a
    // visited set the walk costs 12^depth regex passes (an executor hang
    // from a ~300-byte payload); with it the walk is O(|objs|).
    val selfKids = (Seq.fill(12)("2 0 R") :+ "3 0 R").mkString(" ")
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, s"<< /Type /Pages /Kids [ $selfKids ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, "<< /Length 17 >>", Some("BT (alive) Tj ET".getBytes(ISO_8859_1)))))
    val t0 = System.nanoTime()
    val res = MiniPdfDecoder().decode(pdf)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, s"walk took ${elapsedMs}ms — cycle guard broken")
    assert(res.isRight && res.toOption.get.exists(_.contains("alive")))
  }

  test("two-node /Kids cycle terminates and still yields the reachable page") {
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 5 0 R 3 0 R ] /Count 1 >>", None),
      (5, "<< /Type /Pages /Kids [ 2 0 R 5 0 R ] /Count 0 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, "<< /Length 16 >>", Some("BT (page) Tj ET".getBytes(ISO_8859_1)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res.isRight && res.toOption.get == Seq("<div><p>page</p></div>"))
  }

  test("junk before %PDF- header: decoder slices from the header, router stays real") {
    val clean = buildPdf(Map(4 -> "BT (behind junk) Tj ET"),
      Seq(3 -> Seq(4)), Seq(3), flate = true)
    val junk = "HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
      .getBytes(ISO_8859_1)
    val shifted = junk ++ clean
    assert(MiniPdf.headerOffset(shifted) == junk.length)
    val direct = MiniPdfDecoder().decode(shifted)
    assert(direct == Right(Seq("<div><p>behind junk</p></div>")))
    // AutoPdfDecoder must route to the REAL decoder, not fabricate fake pages
    val routed = AutoPdfDecoder(FakePdfDecoder(40)).decode(shifted)
    assert(routed == Right(Seq("<div><p>behind junk</p></div>")))
    // header beyond the 1024-byte scan window is NOT a PDF
    val farJunk = Array.fill[Byte](2048)('x') ++ clean
    assert(MiniPdf.headerOffset(farJunk) == -1)
  }

  test("literal 'endstream' inside stream bytes survives via direct /Length") {
    // the first-occurrence scan would truncate the content stream at the
    // embedded keyword, losing the second text run with no error signal
    val content = "BT (before) Tj ET BT (endstream inside) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes(ISO_8859_1)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq("<div><p>before endstream inside</p></div>")))
  }

  test("wrong /Length falls back to the endstream scan (damaged-file salvage)") {
    val content = "BT (salvaged) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, "<< /Length 9999 >>", Some(content.getBytes(ISO_8859_1)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq("<div><p>salvaged</p></div>")))
  }

  test("indirect /Length (N 0 R) is ignored, not misread as a byte count") {
    val content = "BT (indirect len) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, "<< /Length 7 0 R >>", Some(content.getBytes(ISO_8859_1))),
      (7, s"${content.length}", None)))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq("<div><p>indirect len</p></div>")))
  }

  test("multi-digit indirect /Length cannot backtrack into a bogus direct length") {
    // `/Length 351 0 R`: without the (?!\d) guard the regex backtracks
    // (\d+) from "351" to "35", the indirect-ref lookahead then passes,
    // and 35 is trusted as a direct byte count. Craft the stream so 35
    // bytes lands exactly on the real `endstream` terminator while an
    // embedded `endstream` occurs earlier: the bogus trusted length
    // would keep the whole payload (emitting both text runs); the
    // correct indirect-ignored path scans to the FIRST endstream and
    // emits only the prefix run.
    val prefix = "BT (first) Tj ET"            // 16 bytes
    val tail = "\nendstream q\nBT (2nd) Tj ET" // embedded terminator + junk run
    val content = prefix + tail
    val refNum = content.length * 10 + 1       // backtracks to content.length
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length $refNum 0 R >>", Some(content.getBytes(ISO_8859_1))),
      (refNum, s"${content.length}", None)))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq("<div><p>first</p></div>")))
  }

  // ------------------------------------------------------------- LZW

  /** PDF/TIFF LZW encoder (early-change convention), the test-side twin
    * of MiniPdf.lzwDecode — used for round-trips and to build genuine
    * /LZWDecode PDFs. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = scala.collection.mutable.HashMap[collection.immutable.ArraySeq[Byte], Int]()
    def reset(): Unit = {
      dict.clear()
      (0 until 256).foreach(i => dict(collection.immutable.ArraySeq(i.toByte)) = i)
      width = 9
    }
    var next = 258
    reset()
    put(256)
    var w = Vector.empty[Byte]
    for (b <- data) {
      val wb = collection.immutable.ArraySeq.from(w :+ b)
      if (dict.contains(wb)) w = w :+ b
      else {
        put(dict(collection.immutable.ArraySeq.from(w)))
        dict(wb) = next; next += 1
        // early change: the encoder is one dict entry ahead of the
        // decoder at the same stream point, so its switch condition is
        // next >= 2^width where the decoder's is len+1 >= 2^width
        if (next >= (1 << width) && width < 12) width += 1
        if (next == 4096) { put(256); reset(); next = 258 }
        w = Vector(b)
      }
    }
    if (w.nonEmpty) put(dict(collection.immutable.ArraySeq.from(w)))
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW known vector: hand-packed codes for ABABAB decode exactly") {
    // codes [CLEAR, 'A', 'B', 258, 258, EOD] at 9 bits, MSB-first,
    // packed by hand: 0x80 0x10 0x48 0x50 0x28 0x14 0x04
    val bytes = Array(0x80, 0x10, 0x48, 0x50, 0x28, 0x14, 0x04).map(_.toByte)
    assert(new String(MiniPdf.lzwDecode(bytes, 1), ISO_8859_1) == "ABABAB")
  }

  test("LZW round-trip: KwKwK runs, width transitions, clear-at-full-table") {
    val rnd = new scala.util.Random(77L)
    val cases = Seq(
      "aaaaaaaaaaaa".getBytes(ISO_8859_1), // KwKwK case on every step
      Array.emptyByteArray,
      "single".getBytes(ISO_8859_1),
      Array.fill(20000)(rnd.nextInt(256).toByte), // incompressible: 9->10->11->12 bits, table fills, clear fires
      (0 until 5000).flatMap(i => s"tok$i ".getBytes(ISO_8859_1)).toArray)
    for (c <- cases)
      assert(java.util.Arrays.equals(MiniPdf.lzwDecode(lzwEncode(c), 1), c),
        s"round-trip failed for ${c.length} bytes")
    // truncation: half the stream must salvage a prefix, never throw
    val enc = lzwEncode(cases(3))
    val half = MiniPdf.lzwDecode(enc.take(enc.length / 2), 1)
    assert(half.length > 0 && half.length < cases(3).length)
    assert(java.util.Arrays.equals(half, cases(3).take(half.length)), "salvaged prefix must match")
  }

  test("LZW convention cross-check: JDK TIFF writer's LZW strips decode bit-exactly") {
    // PDF LZW IS TIFF LZW (ISO 32000-1 cites TIFF 6.0) — the JDK ships
    // a TIFF writer with LZW, giving an AUTHORITATIVE independent
    // encoder to pin the early-change/width convention against (a
    // self-round-trip alone could hide a symmetric off-by-one).
    val rnd = new scala.util.Random(13L)
    val wpx = 64; val hpx = 200 // 12.8k random bytes: crosses 9->10->11 bit widths
    val img = new java.awt.image.BufferedImage(wpx, hpx, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = Array.fill(wpx * hpx)(rnd.nextInt(256).toByte)
    img.getRaster.setDataElements(0, 0, wpx, hpx, raster)
    val wit = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assume(wit.hasNext, "JDK TIFF writer absent")
    val writer = wit.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val t = bos.toByteArray
    // minimal TIFF IFD walk (II and MM)
    val le = t(0) == 'I'
    def u16(o: Int) = if (le) ((t(o) & 0xff) | ((t(o + 1) & 0xff) << 8))
                      else (((t(o) & 0xff) << 8) | (t(o + 1) & 0xff))
    def u32(o: Int): Long =
      if (le) (t(o) & 0xffL) | ((t(o + 1) & 0xffL) << 8) | ((t(o + 2) & 0xffL) << 16) | ((t(o + 3) & 0xffL) << 24)
      else ((t(o) & 0xffL) << 24) | ((t(o + 1) & 0xffL) << 16) | ((t(o + 2) & 0xffL) << 8) | (t(o + 3) & 0xffL)
    val ifd = u32(4).toInt
    val n = u16(ifd)
    var comp = -1; var pred = 1
    var offs = Seq.empty[Long]; var cnts = Seq.empty[Long]
    for (i <- 0 until n) {
      val e = ifd + 2 + 12 * i
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4).toInt
      def arr: Seq[Long] = {
        val sz = if (typ == 3) 2 else 4
        val base = if (cnt.toLong * sz <= 4) e + 8 else u32(e + 8).toInt
        (0 until cnt).map(j => if (typ == 3) u16(base + 2 * j).toLong else u32(base + 4 * j))
      }
      tag match {
        case 259 => comp = arr.head.toInt
        case 273 => offs = arr
        case 279 => cnts = arr
        case 317 => pred = arr.head.toInt
        case _ =>
      }
    }
    assert(comp == 5, s"writer must have used LZW, got compression=$comp")
    val decoded = offs.zip(cnts).flatMap { case (o, c) =>
      MiniPdf.lzwDecode(t.slice(o.toInt, (o + c).toInt), 1)
    }.toArray
    val expected =
      if (pred == 2) raster // would need inverse differencing; JDK default is no predictor
      else raster
    assume(pred == 1, s"JDK writer unexpectedly used predictor $pred")
    assert(decoded.length == expected.length,
      s"decoded ${decoded.length} bytes, expected ${expected.length}")
    assert(java.util.Arrays.equals(decoded, expected),
      "TIFF LZW strips must decode bit-exactly — convention mismatch")
  }

  test("a genuine /LZWDecode PDF extracts its text (incl. chained with ASCIIHex)") {
    val content = "BT /F1 12 Tf 72 720 Td (Legacy LZW stream text) Tj ET"
    val lzw = lzwEncode(content.getBytes(ISO_8859_1))
    val pdf1 = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${lzw.length} /Filter /LZWDecode >>", Some(lzw))))
    assert(MiniPdfDecoder().decode(pdf1) == Right(Seq("<div><p>Legacy LZW stream text</p></div>")))
    // chain: LZW then ASCIIHex armor (decode order is reverse of encode)
    val hex = (lzw.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes(ISO_8859_1)
    val pdf2 = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${hex.length} /Filter [ /ASCIIHexDecode /LZWDecode ] >>", Some(hex))))
    assert(MiniPdfDecoder().decode(pdf2) == Right(Seq("<div><p>Legacy LZW stream text</p></div>")))
  }

  // ------------------------------------------- images / forms / drawings

  test("image XObject: dims from the dict emit a real <img> tag (no pixel decode)") {
    val content = "q 100 0 0 50 10 10 cm /Im1 Do Q BT (with picture) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Image /Width 320 /Height 240 /BitsPerComponent 8 " +
        "/ColorSpace /DeviceRGB /Filter /DCTDecode /Length 4 >>",
        Some(Array[Byte](1, 2, 3, 4)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq(
      "<div><p>with picture</p>" +
        "<img width=\"320\" height=\"240\" src=\"img0.png\" alt=\"\"/></div>")))
  }

  test("image XObject with indirect dims yields 0 (guard), never a misread ref number") {
    val content = "/Im1 Do"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Image /Width 50 0 R /Height 60 0 R /Length 1 >>",
        Some(Array[Byte](0))),
      (50, "777", None), (60, "888", None)))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq(
      "<div><p></p><img width=\"0\" height=\"0\" src=\"img0.png\" alt=\"\"/></div>")))
  }

  test("inline image BI..ID..EI: dims recorded, binary skipped, surrounding text intact") {
    // binary payload contains '(' , 'Tj' and a non-delimited 'EI' lookalike
    val binary = "\u0000(EIx)Tj\u00ff\u0001"
    val content = s"BT (before) Tj ET BI /W 16 /H 8 /BPC 8 ID $binary EI BT (after) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq(
      "<div><p>before after</p>" +
        "<img width=\"16\" height=\"8\" src=\"img0.png\" alt=\"\"/></div>")))
  }

  test("form XObject: text and images inside the form surface on the page") {
    val pageContent = "BT (page text) Tj ET /Fm1 Do"
    val formContent = "BT (form text) Tj ET /Im1 Do"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Fm1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, s"<< /Subtype /Form /Resources << /XObject << /Im1 6 0 R >> >> " +
        s"/Length ${formContent.length} >>", Some(formContent.getBytes(ISO_8859_1))),
      (6, "<< /Subtype /Image /Width 64 /Height 48 /Length 1 >>", Some(Array[Byte](0)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq(
      "<div><p>page text form text</p>" +
        "<img width=\"64\" height=\"48\" src=\"img0.png\" alt=\"\"/></div>")))
  }

  test("self-referencing form XObject terminates (cycle guard)") {
    val pageContent = "/Fm1 Do BT (safe) Tj ET"
    val formContent = "/Fm1 Do BT (inner) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Fm1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, s"<< /Subtype /Form /Length ${formContent.length} >>",
        Some(formContent.getBytes(ISO_8859_1)))))
    val res = MiniPdfDecoder().decode(pdf)
    // form lacks own resources -> inherits page's, whose /Fm1 is on-path
    assert(res == Right(Seq("<div><p>inner safe</p></div>")))
  }

  test("drawings: path operators extract to real SVG (m/l/c/re/h, stroke vs fill)") {
    val content =
      "0 0 m 10 0 l 10 10 l h S " +     // closed stroked triangle
      "5 5 20 30 re f " +               // filled rect
      "0 0 m 1 2 3 4 5 6 c S " +        // curve
      "7 7 m 8 8 l n"                   // clip-only: dropped
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1)))))
    val Right(pairs) = MiniPdfDecoder().decodeWithDrawings(pdf): @unchecked
    assert(pairs.length == 1)
    val svg = pairs.head._2
    assert(svg.startsWith("<svg xmlns="))
    assert(svg.contains("<path d=\"M 0 0 L 10 0 L 10 10 Z\" style=\"fill:none;stroke:#000\"/>"))
    assert(svg.contains("<path d=\"M 5 5 L 25 5 L 25 35 L 5 35 Z\" style=\"fill:#000\"/>"))
    assert(svg.contains("C 1 2 3 4 5 6"))
    assert(!svg.contains("M 7 7")) // n-ended path dropped
    // per-page accessor agrees with the one-pass form
    assert(MiniPdfDecoder().drawings(pdf, 0) == svg)
  }

  test("drawings: resource-listed but never-painted form contributes NO svg; " +
       "twice-painted form contributes twice, in paint order") {
    // page paints: its own rect, then /FmA twice; /FmB is resource-listed
    // but never invoked with Do -> must contribute nothing (PyMuPDF
    // renders painted content only)
    val pageContent = "0 0 5 5 re f /FmA Do /FmA Do"
    val formA = "1 1 m 2 2 l S"
    val formB = "9 9 m 8 8 l S"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /FmA 5 0 R /FmB 6 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, s"<< /Subtype /Form /Length ${formA.length} >>", Some(formA.getBytes(ISO_8859_1))),
      (6, s"<< /Subtype /Form /Length ${formB.length} >>", Some(formB.getBytes(ISO_8859_1)))))
    val svg = MiniPdfDecoder().drawings(pdf, 0)
    assert(!svg.contains("M 9 9"), "never-painted form leaked drawings")
    val aPath = "<path d=\"M 1 1 L 2 2\" style=\"fill:none;stroke:#000\"/>"
    assert(svg.indexOf(aPath) >= 0)
    assert(svg.indexOf(aPath, svg.indexOf(aPath) + 1) > 0,
      "twice-painted form must contribute twice")
    // paint order: page rect first, then the two form strokes
    assert(svg.indexOf("M 0 0") < svg.indexOf(aPath))
  }

  test("drawings: cm CTM, q/Q stack, and form /Matrix transform coordinates") {
    // rect drawn inside q 2 0 0 2 10 20 cm ... Q: scale 2x + translate
    // (10,20); after Q an untransformed rect; then a form with
    // /Matrix [1 0 0 1 100 200] painted under a 3x-scale cm
    val pageContent =
      "q 2 0 0 2 10 20 cm 1 1 3 4 re S Q " +
      "1 1 3 4 re S " +
      "q 3 0 0 3 0 0 cm /FmT Do Q"
    val formT = "0 0 m 1 0 l S"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /FmT 5 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Form /Matrix [ 1 0 0 1 100 200 ] " +
        s"/Length ${formT.length} >>", Some(formT.getBytes(ISO_8859_1)))))
    val svg = MiniPdfDecoder().drawings(pdf, 0)
    // (1,1)-(4,5) rect under scale-2 translate-(10,20): (12,22)-(18,30)
    assert(svg.contains("M 12 22 L 18 22 L 18 30 L 12 30 Z"))
    // after Q: untransformed
    assert(svg.contains("M 1 1 L 4 1 L 4 5 L 1 5 Z"))
    // form /Matrix translate (100,200) composed with cm scale-3:
    // (0,0)->(300,600), (1,0)->(303,600)
    assert(svg.contains("M 300 600 L 303 600"))
  }

  test("drawings: rg/RG/g color operators render, q/Q restores color state, " +
       "and a leading-dot form /Matrix scales correctly") {
    val pageContent =
      "1 0 0 rg 0 0 4 4 re f " +          // red fill
      "0 0.5 0 RG 0 0 m 1 1 l S " +       // mid-green stroke
      "q 0 g 2 2 3 3 re f Q " +           // black inside q..Q
      "5 5 6 6 re f " +                   // red again after Q
      "/FmH Do"
    val formH = "2 2 4 4 re S" // under /Matrix [.5 0 0 .5 0 0]: (1,1)-(3,3)
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /FmH 5 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Form /Matrix [ .5 0 0 .5 0 0 ] " +
        s"/Length ${formH.length} >>", Some(formH.getBytes(ISO_8859_1)))))
    val svg = MiniPdfDecoder().drawings(pdf, 0)
    assert(svg.contains("<path d=\"M 0 0 L 4 0 L 4 4 L 0 4 Z\" style=\"fill:#ff0000\"/>"))
    assert(svg.contains("style=\"fill:none;stroke:#008000\""))
    assert(svg.contains("<path d=\"M 2 2 L 5 2 L 5 5 L 2 5 Z\" style=\"fill:#000000\"/>"))
    assert(svg.contains("<path d=\"M 5 5 L 11 5 L 11 11 L 5 11 Z\" style=\"fill:#ff0000\"/>"),
      "Q must restore the pre-q fill color")
    // .5 must parse as one-half, not 5: rect lands at (1,1)-(3,3)
    assert(svg.contains("M 1 1 L 3 1 L 3 3 L 1 3 Z"),
      "leading-dot /Matrix mis-parsed: " + svg)
  }

  test("simple-font /Encoding /Differences decodes via glyph names (AGL subset), " +
       "unmappable names fall back to identity, ToUnicode wins on overlap") {
    // bytes: A(65) B(66) C(67) a(97) z(122)
    // Differences: 65 -> adieresis, 66 -> space, 67 -> uni0416 (Ж),
    //              97 -> eacute, 122 -> fancyUnknownGlyph (unmappable)
    val content = "BT /F1 12 Tf (ABCaz) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding << /Differences [ 65 /adieresis /space /uni0416 " +
        "97 /eacute 122 /fancyUnknownGlyph ] >> >>", None)))
    val Right(pages) = MiniPdfDecoder().decode(pdf): @unchecked
    // z (unmappable glyph name) stays identity 'z'
    assert(pages == Seq("<div><p>ä Жéz</p></div>"))
  }

  test("named base encodings: /WinAnsiEncoding and /MacRomanEncoding remap the " +
       "upper half; /Differences overlays the base") {
    // WinAnsi: 0x93/0x94 are smart quotes, 0xE9 is é
    val winContent = "BT /F1 12 Tf (A café) Tj ET"
    // MacRoman: 0x8A is ä
    val macContent = "BT /F2 12 Tf (bd) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R 6 0 R ] /Count 2 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${winContent.length} >>", Some(winContent.getBytes(ISO_8859_1))),
      (5, "<< /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >>", None),
      (6, "<< /Type /Page /Parent 2 0 R /Contents 7 0 R " +
        "/Resources << /Font << /F2 8 0 R >> >> >>", None),
      (7, s"<< /Length ${macContent.length} >>", Some(macContent.getBytes(ISO_8859_1))),
      (8, "<< /Type /Font /Subtype /TrueType /Encoding << /BaseEncoding " +
        "/MacRomanEncoding /Differences [ 100 /uni0414 ] >> >>", None)))
    val Right(pages) = MiniPdfDecoder().decode(pdf): @unchecked
    assert(pages(0) == "<div><p>“A” café</p></div>")
    // MacRoman base gives ä at 0x8A; the Differences overlay maps 'd' (100) to Д
    assert(pages(1) == "<div><p>bäД</p></div>")
  }

  test("inline image: 'ID' inside a name token does not truncate the dict") {
    // /Filter named /CCIDFoo contains the bare substring 'ID' — the
    // boundary check must skip it and find the standalone ID operator
    val content = "BT (pre) Tj ET BI /W 7 /H 9 /F /CCIDFoo ID   EI BT (post) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1)))))
    val res = MiniPdfDecoder().decode(pdf)
    assert(res == Right(Seq(
      "<div><p>pre post</p>" +
        "<img width=\"7\" height=\"9\" src=\"img0.png\" alt=\"\"/></div>")))
  }

  test("real PDFs never receive fabricated drawings from the fake decoder") {
    val content = "BT (no drawings here) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1)))))
    val auto = AutoPdfDecoder()
    // a page that paints no paths extracts "" -- NOT FakePdfDecoder's
    // synthetic '<svg width="10"...' marker
    assert(auto.drawings(pdf, 0) == "")
    val Right(pairs) = auto.decodeWithDrawings(pdf): @unchecked
    assert(pairs.map(_._2) == Seq(""))
    // r19: printable text is the TXT document class — no drawings
    assert(auto.drawings("plain text".getBytes(ISO_8859_1), 2) == "")
    // the fake path still serves binary junk (harness fixtures)
    assert(auto.drawings(Array[Byte](0xC3.toByte, 0x28), 2)
      == FakePdfDecoder().drawings(Array.emptyByteArray, 2))
  }
}

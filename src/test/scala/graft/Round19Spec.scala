package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AutoPdfDecoder, Ebooks, Epub}
import graft.operators.Multimodal

/** Round-19 specs — the r18 verdict asks (FB2 tag-boundary guard,
  * SVG/TXT document classes, JBIG2 Huffman refinement, multi-instance
  * SDREFAGG, YCCK JPEGs) and the r18 ADVICE hardening items (MOBI
  * text-encoding field, Ogg serial/granule discipline, ADTS trailing
  * tags, normPath hex validation). */
class Round19Spec extends AnyFunSuite {

  private def wordsPerPage(payload: Array[Byte]): Seq[Int] =
    AutoPdfDecoder().decode(payload) match {
      case Right(pages) => pages.map(p =>
        p.replaceAll("<[^>]+>", " ").trim.split(" +").count(_.nonEmpty))
      case Left(e) => fail(s"decode failed: $e")
    }

  // ------------------------------------ SVG + TXT document classes (r19)

  test("SVG fixtures decode through the production router with the " +
       "planted word count (prologue skip, tspan strip, unescape)") {
    for (id <- 0L to 24L) {
      val counts = wordsPerPage(PdfFixtures.svgDoc(id))
      assert(counts == Seq(2 + (id % 7).toInt), s"id=$id got $counts")
    }
  }

  test("TXT fixtures decode with planted per-page word counts under " +
       "the 66-lines-per-page contract (CRLF + trailing terminator)") {
    for (id <- 0L to 24L) {
      val counts = wordsPerPage(PdfFixtures.txtDoc(id))
      assert(counts.length == 1 + (id % 3).toInt, s"id=$id page count")
      for ((c, g) <- counts.zipWithIndex)
        assert(c == 2 + ((id + g) % 7).toInt, s"id=$id page=$g words=$c")
    }
  }

  test("SVG detection is a root-element walk: HTML embedding an <svg> " +
       "island is NOT the SVG class; torn SVG falls back; a commented " +
       "<text> contributes no words") {
    import graft.sources.PlainDocs
    val html = "<html><body><svg><text>x</text></svg></body></html>".getBytes
    assert(!PlainDocs.isSvg(html))
    // torn: no closing root tag → router fallback, not a fabricated page
    val torn = """<svg xmlns="http://www.w3.org/2000/svg"><text>w</text>""".getBytes
    assert(PlainDocs.isSvg(torn) && PlainDocs.svgPages(torn).isEmpty)
    assert(AutoPdfDecoder().decode(torn).isRight) // fallback serves it
    // comment decoy carries no words (production regression: the odd
    // fixture leg plants one)
    val c = """<svg xmlns="x"><!-- <text>ghost</text> --><text>w w</text></svg>"""
    val pages = graft.sources.PlainDocs.svgPages(c.getBytes).get
    assert(pages.head.contains(">w w<") && !pages.head.contains("ghost"))
    // a text-free SVG is still one (empty) page, as fitz yields
    val bare = """<svg xmlns="x"><rect/></svg>""".getBytes
    assert(PlainDocs.svgPages(bare).get == Seq("<div><p></p></div>"))
  }

  test("TXT detection is strict: control bytes, NULs, and torn UTF-8 " +
       "reject; the 66-line boundary and terminator edges hold") {
    import graft.sources.PlainDocs
    assert(!PlainDocs.isTxt(Array[Byte](0x41, 0x00, 0x42))) // NUL
    assert(!PlainDocs.isTxt(Array[Byte](0x41, 0xC3.toByte, 0x28))) // torn UTF-8
    assert(!PlainDocs.isTxt(Array[Byte](0x41, 0x1B, 0x42))) // ESC control
    assert(PlainDocs.isTxt("tab\tand\ffeed\r\nok".getBytes("UTF-8")))
    // page math: 66 lines = 1 page, 67 = 2; a single trailing
    // terminator never opens an extra page, two do
    def nPages(s: String) = PlainDocs.txtPages(s.getBytes("UTF-8")).get.length
    assert(nPages(Seq.fill(66)("x").mkString("\n")) == 1)
    assert(nPages(Seq.fill(67)("x").mkString("\n")) == 2)
    assert(nPages(Seq.fill(66)("x").mkString("\n") + "\n") == 1)
    assert(nPages(Seq.fill(66)("x").mkString("\n") + "\n\n") == 2)
    // lone CR and CRLF both split
    assert(PlainDocs.txtPages("a\rb\r\nc".getBytes).get.head ==
      "<div><p>a</p><p>b</p><p>c</p></div>")
    // markup in text is escaped into the page shape
    assert(PlainDocs.txtPages("a<b&c".getBytes).get.head ==
      "<div><p>a&lt;b&amp;c</p></div>")
  }

  test("bit-flip fuzz over SVG/TXT fixtures never throws") {
    for (id <- 0L to 5L;
         payload <- Seq(PdfFixtures.svgDoc(id), PdfFixtures.txtDoc(id))) {
      var pos = 0
      while (pos < payload.length) {
        val mut = payload.clone()
        mut(pos) = (mut(pos) ^ 0x55).toByte
        try AutoPdfDecoder().decode(mut)
        catch { case e: Exception => fail(s"threw at id=$id pos=$pos: $e") }
        pos += 5
      }
    }
  }

  // ------------------------------------------------- ADVICE r18 hardening

  test("normPath rejects signed/garbage percent escapes instead of " +
       "writing junk bytes (keeps the raw path)") {
    // valid escapes still decode
    assert(Epub.normPath("a/%41.png") == "a/A.png")
    assert(Epub.normPath("im%C3%A9g.png") == "imég.png")
    // Integer.parseInt would accept the signed form "%-1" as -1
    assert(Epub.normPath("a/%-1bad") == "a/%-1bad")
    assert(Epub.normPath("a/%G1bad") == "a/%G1bad")
    assert(Epub.normPath("100%") == "100%")
    assert(Epub.normPath("100% done/x.png") == "100% done/x.png")
    // ../-clamping unchanged
    assert(Epub.normPath("text/../images/f.png") == "images/f.png")
    assert(Epub.normPath("../../../etc/passwd") == "etc/passwd")
  }

  test("FB2 depth scan requires a tag-name boundary after <section " +
       "(a <sectionTitle> tag must not corrupt the paging)") {
    val xml =
      """<?xml version="1.0"?>""" +
        """<FictionBook xmlns="http://www.gribuser.ru/xml/fictionbook/2.0">""" +
        "<body>" +
        "<section><sectionTitle>t</sectionTitle><p>one two</p></section>" +
        "<section><p>three four five</p></section>" +
        "</body></FictionBook>"
    val counts = wordsPerPage(xml.getBytes("UTF-8"))
    assert(counts == Seq(3, 3), s"got $counts") // "t one two" / "three four five"
  }

  test("MOBI text decodes per the header codec field: CP1252 high " +
       "bytes survive, unknown codecs fail closed") {
    // the withExtra fixture leg declares CP1252 and plants é (0xE9)
    val cp = PdfFixtures.mobiDoc(1L)
    AutoPdfDecoder().decode(cp) match {
      case Right(pages) => assert(pages.head.contains("wé"),
        s"CP1252 é must decode, got: ${pages.head.take(60)}")
      case Left(e) => fail(s"decode failed: $e")
    }
    // the short-header leg declares UTF-8; bare PalmDOC has no field
    assert(wordsPerPage(PdfFixtures.mobiDoc(0L)).nonEmpty)
    assert(wordsPerPage(PdfFixtures.mobiDoc(2L)).nonEmpty)
    // planted word counts still hold across all legs
    for (id <- 0L to 24L) {
      val counts = wordsPerPage(PdfFixtures.mobiDoc(id))
      assert(counts.length == 1 + (id % 3).toInt, s"id=$id page count")
      for ((c, g) <- counts.zipWithIndex)
        assert(c == 2 + ((id + g) % 7).toInt, s"id=$id page=$g words=$c")
    }
    // unknown codec value: dropped, never garbled — patch the long
    // header's codec field (record-0 offset 28) to a junk value
    val junk = PdfFixtures.mobiDoc(1L).clone()
    val off0 = ((junk(78) & 0xff) << 24) | ((junk(79) & 0xff) << 16) |
      ((junk(80) & 0xff) << 8) | (junk(81) & 0xff) // record-0 offset
    junk(off0 + 28) = 0; junk(off0 + 29) = 0
    junk(off0 + 30) = 0x04; junk(off0 + 31) = 0xD3.toByte // 1235
    assert(Ebooks.mobiText(junk).isEmpty, "unknown codec must drop")
  }

  test("Ogg granule tracking is per-serial and skips the -1 sentinel " +
       "(multiplexed/chained streams, continuation pages)") {
    // the fixture's id%20==13 leg interleaves a second stream whose
    // EOS granule (999999999) trails the audio EOS, plus a granule=-1
    // continuation page — frames must still read preskip+total
    val m = Multimodal.audioMeta(PdfFixtures.audioDoc(13L))
    assert(m.isDefined, "multiplexed Ogg must still decode")
    val total = 3000L + 13 % 4000
    assert(m.get.frames == total, s"frames=${m.get.frames} want $total")
    assert(m.get.format == "opus")
    // the plain leg is unchanged
    val p = Multimodal.audioMeta(PdfFixtures.audioDoc(3L))
    assert(p.exists(_.frames == 3000L + 3 % 4000))
  }

  test("ADTS walks tolerate a trailing ID3v1 TAG block and the ID3v2 " +
       "footer flag") {
    val tagged = Multimodal.audioMeta(PdfFixtures.audioDoc(4L)) // + TAG
    assert(tagged.isDefined, "trailing ID3v1 TAG must not drop the stream")
    assert(tagged.get.frames == 1024L * (2 + 4 % 5))
    val footer = Multimodal.audioMeta(PdfFixtures.audioDoc(9L)) // ID3v2+footer
    assert(footer.isDefined, "ID3v2 footer flag must not drop the stream")
    assert(footer.get.frames == 1024L * (2 + 9 % 5))
    // a payload that is ONLY a TAG block is not audio
    assert(Multimodal.aacAdtsMeta(
      ("TAG" + "x" * 125).getBytes("ISO-8859-1")).isEmpty)
    // bit-flip fuzz over the new shapes: Option, never a throw
    val r = new scala.util.Random(19)
    for (leg <- Seq(13L, 4L, 9L); _ <- 0 until 200) {
      val m = PdfFixtures.audioDoc(leg).clone()
      m(r.nextInt(m.length)) = (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      Multimodal.audioMeta(m)
    }
  }
}

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

  // ---------------------------- JBIG2 Huffman refinement (B.14/B.15, r19)

  test("B.14 and B.15 satisfy the standard-table invariants: Kraft-" +
       "complete prefix codes, contiguous coverage, exact round-trip") {
    import graft.sources.Jbig2Huffman._
    assert(B14.valid && B15.valid, "Kraft equality must hold")
    def roundTrip(t: HTable, v: Long): Option[Long] = {
      val bw = new BitWriter
      t.encode(bw, Some(v))
      val bytes = bw.result()
      t.decode(new BitReader(bytes, 0, bytes.length)).flatten
    }
    // B.14 covers exactly [-2, 2]; every value round-trips
    for (v <- -2L to 2L) assert(roundTrip(B14, v).contains(v), s"B14 $v")
    // B.15 covers [-24, 24] contiguously plus the 32-bit tails
    for (v <- -24L to 24L) assert(roundTrip(B15, v).contains(v), s"B15 $v")
    for (v <- Seq(-25L, -4096L, 25L, 4096L))
      assert(roundTrip(B15, v).contains(v), s"B15 tail $v")
    // a delta outside B.14's range is unencodable under that select —
    // the decode side fails closed on an unmatched prefix
    assert(intercept[IllegalArgumentException] {
      val bw = new BitWriter; B14.encode(bw, Some(3L))
    } != null)
  }

  test("Huffman-refinement text regions decode: fixtures round-trip " +
       "planted black counts across GR templates 0/1") {
    import graft.sources.Jbig2
    for (id <- 0L to 11L) {
      val k = 2 + (id % 3).toInt
      val w = 2 * k + 6; val h = k + 3
      val solid = Array.fill(k * k)(true)
      def hollow(n: Int): Array[Boolean] = Array.tabulate(n * n) { i =>
        val x = i % n; val y = i / n
        x == 0 || y == 0 || x == n - 1 || y == n - 1
      }
      val stream = Jbig2.encodeEmbeddedRefinedTextHuffman(
        Seq((k, k, solid)),
        Seq((0, 1, 1, None), (0, k + 3, 1, Some((1, 1, 0, 0, hollow(k + 1))))),
        w, h, sbrTemplate = ((id / 2) % 2).toInt)
      val out = Jbig2.decodeEmbedded(None, stream, w, h)
      assert(out.isDefined, s"id=$id must decode")
      assert(out.get.count(b => b) == k * k + 4 * k, s"id=$id black count")
    }
  }

  test("Huffman-refinement fail-closed + fuzz: nonzero refinement " +
       "selects without SBREFINE reject; truncation and bit flips " +
       "never throw") {
    import graft.sources.Jbig2
    val good = {
      val solid = Array.fill(4)(true)
      Jbig2.encodeEmbeddedRefinedTextHuffman(
        Seq((2, 2, solid)),
        Seq((0, 0, 0, Some((1, 1, 0, 0, Array.fill(9)(true))))), 8, 5)
    }
    assert(Jbig2.decodeEmbedded(None, good, 8, 5).isDefined)
    for (cut <- 1 until good.length)
      Jbig2.decodeEmbedded(None, good.take(cut), 8, 5) // Option, never a throw
    val r = new scala.util.Random(1905)
    for (_ <- 0 until 400) {
      val m = good.clone()
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      Jbig2.decodeEmbedded(None, m, 8, 5)
    }
  }

  // ----------------------------------- multi-instance SDREFAGG (r19)

  test("multi-instance SDREFAGG aggregates decode: the nested text " +
       "region composes refined + plain instances onto the symbol " +
       "canvas with dictionary-level statistics") {
    import graft.sources.Jbig2
    for (id <- 0L to 11L) {
      val k = 2 + (id % 3).toInt
      val w = 3 * k + 4; val h = k + 2
      val solid = Array.fill(k * k)(true)
      val hollow = Array.tabulate(k * k) { i =>
        val x = i % k; val y = i / k
        x == 0 || y == 0 || x == k - 1 || y == k - 1
      }
      val stream = Jbig2.encodeEmbeddedMultiAggText(
        Seq((k, k, solid)), 2 * k + 1, k,
        Seq((0, 0, 0, Some((0, 0, 0, 0, hollow))), (0, k + 1, 0, None)),
        Seq((0, 1, 1), (1, k + 2, 1)),
        w, h, sdrTemplate = ((id / 2) % 2).toInt)
      val out = Jbig2.decodeEmbedded(None, stream, w, h)
      assert(out.isDefined, s"id=$id must decode")
      assert(out.get.count(b => b) == 2 * k * k + 4 * k - 4,
        s"id=$id black count")
    }
  }

  test("multi-instance SDREFAGG fail-closed + fuzz: hostile instance " +
       "counts reject; truncations and bit flips never throw") {
    import graft.sources.Jbig2
    val solid = Array.fill(4)(true)
    val hollow = Array(true, true, true, true) // k=2: all border
    val good = Jbig2.encodeEmbeddedMultiAggText(
      Seq((2, 2, solid)), 5, 2,
      Seq((0, 0, 0, Some((0, 0, 0, 0, hollow))), (0, 3, 0, None)),
      Seq((0, 1, 1), (1, 4, 1)), 10, 4)
    assert(Jbig2.decodeEmbedded(None, good, 10, 4).isDefined)
    for (cut <- 1 until good.length)
      Jbig2.decodeEmbedded(None, good.take(cut), 10, 4) // no throw
    val r = new scala.util.Random(1906)
    for (_ <- 0 until 400) {
      val m = good.clone()
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      Jbig2.decodeEmbedded(None, m, 10, 4)
    }
  }

  test("SVG data-URI <image> payloads surface through decodeWithImages; " +
       "dangling file refs are skipped; the hot text route reads none") {
    for (id <- Seq(4L, 9L, 14L)) { // the q402 fixture's SVG leg
      val payload = PdfFixtures.docImagesDoc(id)
      val pages = AutoPdfDecoder().decodeWithImages(payload)
      assert(pages.isRight, s"id=$id")
      val imgs = pages.toOption.get.flatMap(_._2)
      assert(imgs.length == 1, s"id=$id image count (decoy must be skipped)")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(imgs.head))
      assert(img.getWidth == 6 + (id % 10).toInt &&
        img.getHeight == 5 + (id % 7).toInt, s"id=$id dims")
      assert(pages.toOption.get.head._1.contains("w w"), s"id=$id text")
      // the text route carries the page but resolves no payloads
      val textOnly = AutoPdfDecoder().decode(payload)
      assert(textOnly.isRight && textOnly.toOption.get.length == 1)
    }
  }

  // ------------------------------------------------- YCCK JPEGs (r19)

  test("YCCK JPEGs decode through the JFIF inverse + Adobe un-invert: " +
       "planted stored samples land the closed-form luminance") {
    val spark = TestSpark.spark
    import spark.implicits._
    def jpegPayloadOf(pdf: Array[Byte]): Array[Byte] = {
      val Right(pages) =
        graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
      pages.flatMap(_._2).head
    }
    for (id <- Seq(0L, 7L, 20L, 33L, 101L)) {
      val payload = jpegPayloadOf(PdfFixtures.ycckJpegDoc(id))
      val ys = ((id * 3) % 256).toDouble
      val cb = ((id * 7) % 256) - 128.0
      val cr = ((id * 11) % 256) - 128.0
      val ks = ((id * 5) % 256).toInt
      def clamp(v: Double): Int = {
        val r = math.floor(v + 0.5)
        if (r < 0) 0 else if (r > 255) 255 else r.toInt
      }
      val c = 255 - clamp(ys + 1.402 * cr)
      val m = 255 - clamp(ys - 0.344136 * cb - 0.714136 * cr)
      val y = 255 - clamp(ys + 1.772 * cb)
      val k = 255 - ks
      val expect = 0.299 * (255 - math.min(255, c + k)) +
        0.587 * (255 - math.min(255, m + k)) +
        0.114 * (255 - math.min(255, y + k))
      val df = Seq((id, payload)).toDF("doc_id", "media")
      val feats = graft.operators.Multimodal.extractImageFeatures(df).collect()
      assert(feats.length == 1, s"id=$id: YCCK JPEG must yield features")
      assert(math.abs(feats.head.lum.get - expect) < 1e-9,
        s"id=$id lum ${feats.head.lum} != $expect")
    }
    // bit-flip fuzz: Option rows, never a throw
    val r = new scala.util.Random(1907)
    val good = jpegPayloadOf(PdfFixtures.ycckJpegDoc(3L))
    for (_ <- 0 until 150) {
      val m = good.clone()
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      val df = Seq((0L, m)).toDF("doc_id", "media")
      graft.operators.Multimodal.extractImageFeatures(df).collect()
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
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      Multimodal.audioMeta(m)
    }
  }

  // ------------------------------ bare-raster documents (r19, q408)

  test("bare raster payloads route as one-page wordless documents; " +
       "the image route surfaces the payload VERBATIM") {
    import graft.sources.ImageDocs
    for (id <- 0L to 7L) { // covers all four container legs twice
      val payload = PdfFixtures.imageDoc(id)
      assert(ImageDocs.isImage(payload), s"id=$id sniff")
      // text route: one page, zero words, no image resolution
      val text = AutoPdfDecoder().decode(payload)
      assert(text == Right(Seq(ImageDocs.Page)), s"id=$id text route")
      // image route: the payload itself, byte-identical (no re-encode)
      val full = AutoPdfDecoder().decodeWithImages(payload)
      assert(full.isRight, s"id=$id image route")
      val pages = full.toOption.get
      assert(pages.length == 1 && pages.head._2.length == 1, s"id=$id shape")
      assert(java.util.Arrays.equals(pages.head._2.head, payload),
        s"id=$id verbatim")
    }
    // a JPEG payload routes too (lossy, so q408 pins no luminance on it)
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    assert(ImageDocs.isImage(jb.toByteArray))
    assert(AutoPdfDecoder().decode(jb.toByteArray) ==
      Right(Seq(ImageDocs.Page)))
  }

  test("image sniffing never steals text or other document classes: " +
       "BM/GIF-prefixed printable text, short payloads, and existing " +
       "classes keep their routes; bit-flip fuzz never throws") {
    import graft.sources.{ImageDocs, PlainDocs}
    // "BM" text: BMP's reserved bytes (6-9) are printable here → TXT
    val bmText = "BMW builds cars.\nA second line.".getBytes("UTF-8")
    assert(!ImageDocs.isImage(bmText))
    assert(PlainDocs.txtPages(bmText).isDefined)
    // short/degenerate payloads decline
    assert(!ImageDocs.isImage(null))
    assert(!ImageDocs.isImage("BM".getBytes))
    assert(!ImageDocs.isImage(Array.emptyByteArray))
    // TORN rasters (valid magic, unparseable header) are NOT claimed —
    // fitz's open parses the header, so these must reach the error
    // channel, not fabricate a wordless "success" page
    assert(!ImageDocs.isImage(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
        Array.fill[Byte](20)(0x00))) // JPEG SOI + garbage, no SOF
    assert(!ImageDocs.isImage(
      PdfFixtures.imageDoc(0L).take(16))) // PNG truncated mid-IHDR
    assert(!ImageDocs.isImage(
      "GIF89a".getBytes ++ Array.fill[Byte](10)(0))) // GIF 0x0 dims
    // header dims parse exactly on every lossless leg
    for (id <- 0L to 3L)
      assert(ImageDocs.headerDims(PdfFixtures.imageDoc(id)) ==
        Some((6 + (id % 10).toInt, 5 + (id % 7).toInt)), s"id=$id dims")
    // the PDF/SVG/TXT classes still win their routes (sniff ordering)
    assert(!ImageDocs.isImage("""<svg xmlns="x"><text>w</text></svg>""".getBytes))
    // bit-flip fuzz across the four container legs: Option/Either
    // all the way down, never a throw
    val r = new scala.util.Random(1908)
    for (id <- 0L to 3L; _ <- 0 until 150) {
      val m = PdfFixtures.imageDoc(id).clone()
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      AutoPdfDecoder().decode(m)
      AutoPdfDecoder().decodeWithImages(m)
    }
  }

  // --------------------------------- Netpbm + PSD documents (r19)

  test("binary Netpbm decodes from scratch with real luminance: P4 " +
       "bit order + row padding, P5 gray, P6 RGB, comments, 2-byte " +
       "samples; ASCII twins and torn rasters stay out") {
    import graft.sources.ImageDocs
    for (id <- 0L to 11L) {
      val m = ImageDocs.pnmMeta(PdfFixtures.pnmDoc(id))
      assert(m.isDefined, s"id=$id")
      val (w, h, lum, ch) = m.get
      assert(w == 6 + (id % 10).toInt && h == 5 + (id % 7).toInt, s"id=$id dims")
      (id % 3) match {
        case 0 => // first row black: mean = 255-ish * (h-1)/h
          assert(ch == 1 && math.abs(lum - 255.0 * (h - 1) / h) < 1e-9, s"id=$id P4 $lum")
        case 1 =>
          val g = ((id * 11) % 256).toInt
          assert(ch == 1 && math.abs(lum - g) < 1e-9, s"id=$id P5 $lum")
        case _ =>
          val e = 0.299 * ((id * 3) % 256) + 0.587 * ((id * 5) % 256) +
            0.114 * ((id * 7) % 256)
          assert(ch == 3 && math.abs(lum - e) < 1e-9, s"id=$id P6 $lum")
      }
      // routes as a one-page image document, payload verbatim
      val pages = AutoPdfDecoder().decodeWithImages(PdfFixtures.pnmDoc(id))
      assert(pages.isRight && pages.toOption.get.head._2.length == 1, s"id=$id route")
    }
    // 2-byte samples (maxval > 255): big-endian, exact scaling
    val wide = "P5\n2 1\n65535\n".getBytes("US-ASCII") ++
      Array[Byte](0xff.toByte, 0xff.toByte, 0x7f.toByte, 0xff.toByte)
    val wm = ImageDocs.pnmMeta(wide)
    assert(wm.isDefined && math.abs(wm.get._3 -
      (255.0 + 32767 * 255.0 / 65535) / 2) < 1e-9, s"16-bit $wm")
    // ASCII P2 is printable text, not an image
    val p2 = "P2\n2 1\n255\n10 20\n".getBytes("US-ASCII")
    assert(!ImageDocs.isImage(p2))
    assert(graft.sources.PlainDocs.txtPages(p2).isDefined)
    // torn raster (one byte short) and over-maxval samples reject
    val good = PdfFixtures.pnmDoc(1L)
    assert(ImageDocs.pnmMeta(good.dropRight(1)).isEmpty, "torn raster")
    val over = "P5\n1 1\n100\n".getBytes("US-ASCII") ++ Array[Byte](200.toByte)
    assert(ImageDocs.pnmMeta(over).isEmpty, "over-maxval sample")
    // bit-flip fuzz: never a throw
    val r = new scala.util.Random(1910)
    for (id <- 0L to 2L; _ <- 0 until 200) {
      val m = PdfFixtures.pnmDoc(id).clone()
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      ImageDocs.pnmMeta(m); AutoPdfDecoder().decode(m)
    }
  }

  test("PSD headers surface dims with luminance ABSENT; reserved-byte " +
       "and envelope guards reject hostile headers") {
    import graft.sources.ImageDocs
    for (id <- 0L to 7L) {
      val d = ImageDocs.psdDims(PdfFixtures.psdDoc(id))
      assert(d.contains((6 + (id % 10).toInt, 5 + (id % 7).toInt, 3)), s"id=$id")
      assert(ImageDocs.isImage(PdfFixtures.psdDoc(id)))
    }
    val good = PdfFixtures.psdDoc(0L)
    def pat(off: Int, v: Int): Array[Byte] = {
      val m = good.clone(); m(off) = v.toByte; m
    }
    assert(ImageDocs.psdDims(pat(7, 1)).isEmpty, "nonzero reserved byte")
    assert(ImageDocs.psdDims(pat(5, 2)).isEmpty, "version 2 (PSB) out of envelope")
    assert(ImageDocs.psdDims(pat(23, 9)).isEmpty, "invalid depth")
    assert(ImageDocs.psdDims(good.take(20)).isEmpty, "torn header")
  }

  // ------------------------------------------- AVI containers (r19)

  test("AVI main-header metadata: planted values round-trip through " +
       "the RIFF walk incl. odd-sized JUNK alignment; torn and " +
       "hostile headers fail closed; bit flips never throw") {
    for (id <- 0L to 11L) {
      val m = Multimodal.videoMeta(PdfFixtures.aviDoc(id))
      assert(m.isDefined, s"id=$id")
      val v = m.get
      assert(v.format == "avi" &&
        v.durationMs == (100 + id % 900) * (10 + id % 24) &&
        v.width == 320 + (id % 16).toInt * 8 &&
        v.height == 180 + (id % 9).toInt * 20 &&
        v.tracks == 1 + (id % 3).toInt, s"id=$id $v")
    }
    // torn: every truncation point is Option, never a throw
    val good = PdfFixtures.aviDoc(3L)
    for (cut <- 1 until good.length)
      Multimodal.videoMeta(good.take(cut))
    // hostile: zero dims / zero rate / absurd stream count reject
    def patched(off: Int, v: Long): Array[Byte] = {
      val m = good.clone()
      for (i <- 0 until 4) m(off + i) = ((v >> (8 * i)) & 0xff).toByte
      m
    }
    // avih body in the odd-id=3 fixture sits after RIFF(12) + JUNK(8+7+1)
    // + LIST hdr(8) + "hdrl"(4) + avih hdr(8) = offset 48
    val b = 48
    assert(Multimodal.videoMeta(patched(b, 0L)).isEmpty, "zero rate")
    assert(Multimodal.videoMeta(patched(b + 32, 0L)).isEmpty, "zero width")
    assert(Multimodal.videoMeta(patched(b + 24, 100000L)).isEmpty, "streams")
    // bit-flip fuzz
    val r = new scala.util.Random(1909)
    for (_ <- 0 until 300) {
      val m = good.clone()
      val fi = r.nextInt(m.length)
      m(fi) = (m(fi) ^ (1 << r.nextInt(8))).toByte
      Multimodal.videoMeta(m)
    }
  }

  // ------------------------------- round-close review fixes (r19)

  test("TXT route edge payloads fall back, never throw or fabricate: " +
       "null, empty, and over-cap printable bodies") {
    import graft.sources.PlainDocs
    // null: every detector declines, the terminal TXT route must too
    assert(PlainDocs.txtPages(null).isEmpty)
    assert(AutoPdfDecoder().decode(null) ==
      Left("cannot open document: null payload"))
    // empty: a zero-byte body is NOT a one-page document
    assert(PlainDocs.txtPages(Array.emptyByteArray).isEmpty)
    assert(AutoPdfDecoder().decode(Array.emptyByteArray) ==
      Left("cannot open document: empty payload"))
    // over the 64 MB cap: the route must not materialize the string
    val big = new Array[Byte](64 * 1024 * 1024 + 1)
    java.util.Arrays.fill(big, 'a'.toByte)
    assert(PlainDocs.txtPages(big).isEmpty)
    assert(!PlainDocs.isTxt(big))
  }

  test("SVG detection survives a DOCTYPE internal subset and a long " +
       "comment prologue inside the 8 KB head window") {
    import graft.sources.PlainDocs
    val subset = ("""<!DOCTYPE svg [<!ENTITY e "x">]>""" +
      """<svg xmlns="http://www.w3.org/2000/svg"><text>w w</text></svg>""").getBytes
    assert(PlainDocs.isSvg(subset), "internal subset must not end the DOCTYPE")
    assert(PlainDocs.svgPages(subset).get.head.contains(">w w<"))
    val longComment = ("<!-- " + "c" * 4000 + " -->" +
      """<svg xmlns="x"><text>w</text></svg>""").getBytes
    assert(PlainDocs.isSvg(longComment), "4 KB prologue sits inside the window")
    assert(PlainDocs.svgPages(longComment).get.head.contains(">w<"))
    // past the window the payload classifies as its printable-text
    // fallback — the documented detection bound, one page per 66 lines
    val past = ("<!-- " + "c" * 9000 + " -->" +
      """<svg xmlns="x"><text>w</text></svg>""").getBytes
    assert(!PlainDocs.isSvg(past))
    assert(AutoPdfDecoder().decode(past).isRight)
  }

  test("a hostile near-Int.MaxValue Huffman-refinement BMSIZE fails " +
       "closed instead of wrapping the bounds check and throwing") {
    import graft.sources.Jbig2
    val solid = Array.fill(4)(true)
    val hostile = Jbig2.encodeEmbeddedRefinedTextHuffman(
      Seq((2, 2, solid)),
      Seq((0, 0, 0, Some((1, 1, 0, 0, Array.fill(9)(true))))), 8, 5,
      bmsizeOverride = Some(2147483600L))
    assert(Jbig2.decodeEmbedded(None, hostile, 8, 5).isEmpty,
      "overflowing BMSIZE must yield None, not a throw")
    // and an honest oversize (bigger than the segment, no overflow)
    // also fails the same bound
    val oversize = Jbig2.encodeEmbeddedRefinedTextHuffman(
      Seq((2, 2, solid)),
      Seq((0, 0, 0, Some((1, 1, 0, 0, Array.fill(9)(true))))), 8, 5,
      bmsizeOverride = Some(100000L))
    assert(Jbig2.decodeEmbedded(None, oversize, 8, 5).isEmpty)
  }
}

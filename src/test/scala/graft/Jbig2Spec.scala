package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CcittG4, Jbig2}

/** T.88 generic-region codec (r16): MQ coder round-trips, template /
  * TPGDON coverage, the MMR leg cross-checked against the
  * independently-validated T.6 codec, embedded segment parsing,
  * fail-closed behavior on out-of-envelope segment types, fuzz. */
class Jbig2Spec extends AnyFunSuite {

  private def rnd = new scala.util.Random(88)

  private def shapes: Seq[(Int, Int)] =
    Seq((1, 1), (7, 3), (8, 8), (13, 5), (64, 32), (33, 17))

  private def patterns(w: Int, h: Int): Seq[Array[Boolean]] = {
    val r = new scala.util.Random(w * 31 + h)
    Seq(
      Array.fill(w * h)(false),
      Array.fill(w * h)(true),
      Array.tabulate(w * h)(i => i % w < w / 2),      // vertical split
      Array.tabulate(w * h)(i => (i / w) % 2 == 0),   // row stripes (TPGD-ish)
      Array.tabulate(w * h)(_ => r.nextBoolean()),    // noise
      Array.tabulate(w * h)(i => (i % w + i / w) % 3 == 0))
  }

  test("generic-region MQ encode → decode is the identity across " +
       "templates 0-3, TPGDON on/off, and pattern/shape classes") {
    for {
      (w, h) <- shapes
      px <- patterns(w, h)
      template <- 0 to 3
      tpgdon <- Seq(false, true)
    } {
      val enc = Jbig2.encodeGeneric(px, w, h, template, tpgdon)
      val at = if (template == 0) Array(3, -1, -3, -1, 2, -2, -2, -2)
               else if (template == 1) Array(3, -1) else Array(2, -1)
      val dec = Jbig2.decodeGeneric(enc, w, h, template, tpgdon, at)
      assert(dec.isDefined, s"t$template tpgd=$tpgdon ${w}x$h")
      assert(dec.get.sameElements(px), s"t$template tpgd=$tpgdon ${w}x$h")
    }
  }

  test("TPGDON actually compresses repeated rows (the LTP path runs, " +
       "not just round-trips)") {
    val w = 64; val h = 64
    val px = Array.tabulate(w * h)(i => (i % w) < 20) // identical rows
    val plain = Jbig2.encodeGeneric(px, w, h, 0, tpgdon = false)
    val tpgd = Jbig2.encodeGeneric(px, w, h, 0, tpgdon = true)
    assert(tpgd.length < plain.length,
      s"tpgd ${tpgd.length} should beat plain ${plain.length} on identical rows")
  }

  test("embedded stream (page info + immediate lossless generic region) " +
       "round-trips; the MMR leg cross-checks against CcittG4") {
    for ((w, h) <- shapes; px <- patterns(w, h).take(4)) {
      val mqStream = Jbig2.encodeEmbedded(px, w, h)
      assert(Jbig2.decodeEmbedded(None, mqStream, w, h).exists(_.sameElements(px)),
        s"MQ embedded ${w}x$h")
      val mmrStream = Jbig2.encodeEmbedded(px, w, h, mmr = true)
      assert(Jbig2.decodeEmbedded(None, mmrStream, w, h).exists(_.sameElements(px)),
        s"MMR embedded ${w}x$h")
    }
    // the MMR payload is genuine T.6: decode the region bytes directly
    // with the CCITT codec (independent of the JBIG2 walker)
    val w = 16; val h = 4
    val px = Array.tabulate(w * h)(i => i % w >= 12)
    val mmr = Jbig2.encodeEmbedded(px, w, h, mmr = true)
    // page-info segment = 11-byte header + 19 data; region header =
    // 11-byte header; region data = 17 info + 1 flags, then T.6 bytes
    val t6 = java.util.Arrays.copyOfRange(mmr, 30 + 11 + 18, mmr.length)
    assert(CcittG4.decode(t6, w, h).exists(_.sameElements(px)))
  }

  test("globals/data split: page info in the globals stream, region in " +
       "the data stream (the PDF /JBIG2Globals arrangement)") {
    val w = 12; val h = 6
    val px = Array.tabulate(w * h)(i => i % 3 == 0)
    val full = Jbig2.encodeEmbedded(px, w, h)
    val globals = java.util.Arrays.copyOfRange(full, 0, 30)
    val data = java.util.Arrays.copyOfRange(full, 30, full.length)
    assert(Jbig2.decodeEmbedded(Some(globals), data, w, h)
      .exists(_.sameElements(px)))
    // region alone (no page info anywhere) still composites onto a
    // default-0 page of the PDF dims
    assert(Jbig2.decodeEmbedded(None, data, w, h).exists(_.sameElements(px)))
  }

  test("Annex A integer coder round-trips every prefix range, signs, " +
       "OOB, and random interleavings across multiple procedures") {
    val rng = new scala.util.Random(7)
    val values: Seq[Option[Int]] =
      Seq(0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 100000)
        .flatMap(v => Seq(Some(v), Some(-v))) ++ Seq(None, Some(0)) ++
        Seq.fill(200)(Some(rng.nextInt(2000000) - 1000000))
    val enc = new Jbig2.MqEncoder
    val eA = new Jbig2.MqInt; val eB = new Jbig2.MqInt
    // interleave two procedures so their context tables stay separate
    for ((v, i) <- values.zipWithIndex)
      (if (i % 2 == 0) eA else eB).encode(enc, v)
    val data = enc.flush()
    val mq = new Jbig2.MqDecoder(data)
    val dA = new Jbig2.MqInt; val dB = new Jbig2.MqInt
    for ((v, i) <- values.zipWithIndex) {
      val got = (if (i % 2 == 0) dA else dB).decode(mq)
      // -0 is the OOB encoding, so Some(-0)=Some(0) and None share a
      // wire form differing only in sign; both decode to the value the
      // encoder intended except literal Some(0) after None stays Some(0)
      assert(got == v || (v.contains(0) && got.contains(0)),
        s"index $i: $v -> $got")
    }
  }

  // --------------------- symbol dictionary + text region (arithmetic)

  private def glyphOf(pattern: Seq[String]): (Int, Int, Array[Boolean]) = {
    val h = pattern.length; val w = pattern.head.length
    (w, h, pattern.flatMap(_.map(_ == '#')).toArray)
  }

  test("symbol dictionary + text region: planted glyphs render at the " +
       "planted positions through the full arithmetic path (IADH/IADW/" +
       "IAEX/IADT/IAFS/IADS/IAID + shared-context bitmaps)") {
    val gA = glyphOf(Seq("###", "#.#", "###")) // 3x3 ring
    val gB = glyphOf(Seq("#..#", ".##.", ".##.", "#..#")) // 4x4 X
    val gC = glyphOf(Seq("##", "##")) // 2x2 block
    val pageW = 40; val pageH = 16
    val places = Seq((0, 2, 1), (1, 10, 1), (2, 20, 2), (0, 30, 9),
      (2, 6, 9), (1, 14, 10))
    val stream = Jbig2.encodeEmbeddedText(Seq(gA, gB, gC), places, pageW, pageH)
    val page = Jbig2.decodeEmbedded(None, stream, pageW, pageH).get
    val expect = new Array[Boolean](pageW * pageH)
    for ((si, x, y) <- places) {
      val (gw, gh, bits) = Seq(gA, gB, gC)(si)
      for (yy <- 0 until gh; xx <- 0 until gw if bits(yy * gw + xx))
        expect((y + yy) * pageW + (x + xx)) = true
    }
    assert(page.sameElements(expect))
  }

  test("text region symbols resolve through the referred-segment list; " +
       "a dict in the GLOBALS stream serves a region in the data stream") {
    val g = glyphOf(Seq("##", ".#"))
    val full = Jbig2.encodeEmbeddedText(Seq(g), Seq((0, 3, 2), (0, 9, 5)), 16, 8)
    // split: [page info + symbol dict] as globals, [text region] as data.
    // page info = 30 bytes; dict = 11-byte header + (2+8+8+sd) data
    val segs = full
    val dictLen = {
      // parse the dict segment's length field from its header at 30
      val o = 30 + 7
      (((segs(o) & 0xff) << 24) | ((segs(o + 1) & 0xff) << 16) |
        ((segs(o + 2) & 0xff) << 8) | (segs(o + 3) & 0xff))
    }
    val cut = 30 + 11 + dictLen
    val globals = java.util.Arrays.copyOfRange(full, 0, cut)
    val data = java.util.Arrays.copyOfRange(full, cut, full.length)
    val viaGlobals = Jbig2.decodeEmbedded(Some(globals), data, 16, 8)
    val direct = Jbig2.decodeEmbedded(None, full, 16, 8)
    assert(viaGlobals.isDefined && direct.isDefined)
    assert(viaGlobals.get.sameElements(direct.get))
    // region WITHOUT its dictionary fails closed (refs don't resolve)
    assert(Jbig2.decodeEmbedded(None, data, 16, 8).isEmpty)
  }

  test("TRANSPOSED text regions: column strips render the same page as " +
       "the row-strip encoding of identical instances") {
    val gA = glyphOf(Seq("##", ".#", "##"))
    val gB = glyphOf(Seq("#.#", ".#."))
    val places = Seq((0, 2, 1), (1, 7, 3), (0, 2, 8), (1, 12, 1))
    val plain = Jbig2.encodeEmbeddedText(Seq(gA, gB), places, 18, 14)
    val trans = Jbig2.encodeEmbeddedText(Seq(gA, gB), places, 18, 14,
      transposed = true)
    val p1 = Jbig2.decodeEmbedded(None, plain, 18, 14)
    val p2 = Jbig2.decodeEmbedded(None, trans, 18, 14)
    assert(p1.isDefined && p2.isDefined)
    assert(p1.get.sameElements(p2.get),
      "axis-swapped placement must land identical pixels")
    // two glyphs stacked in ONE column exercise the S-advance-by-height
    // path (curS += h-1) inside a single transposed strip
    val stacked = Jbig2.encodeEmbeddedText(Seq(gA), Seq((0, 4, 1), (0, 4, 7)),
      10, 12, transposed = true)
    val page = Jbig2.decodeEmbedded(None, stacked, 10, 12).get
    val expect = new Array[Boolean](10 * 12)
    for ((_, x, y) <- Seq((0, 4, 1), (0, 4, 7));
         yy <- 0 until 3; xx <- 0 until 2 if gA._3(yy * 2 + xx))
      expect((y + yy) * 10 + (x + xx)) = true
    assert(page.sameElements(expect))
  }

  test("symbol/text fuzz: bit-flipped and truncated streams never throw " +
       "AND never spin (the MQ decoder feeds 1-bits past end-of-data — " +
       "the export/height-class loops need progress guards)") {
    val g1 = glyphOf(Seq("###", ".#.")) ; val g2 = glyphOf(Seq("#", "#", "#"))
    val good = Jbig2.encodeEmbeddedText(Seq(g1, g2),
      Seq((0, 1, 1), (1, 8, 2), (0, 14, 8)), 20, 12)
    val r = new scala.util.Random(42)
    for (_ <- 0 until 400) {
      val m = good.clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      Jbig2.decodeEmbedded(None, m, 20, 12) // Option either way
    }
    // EVERY truncation point, incl. cuts inside the dictionary's MQ
    // payload whose 0xFF tail used to decode run=0/dh=0 forever
    for (cut <- 1 until good.length)
      Jbig2.decodeEmbedded(None, good.take(cut), 20, 12)
  }

  test("review regressions: dict context-reuse flag and invalid " +
       "external comb ops fail closed; striped pages decode (r17); " +
       "text XNOR comb op is honoured (not silently decoded as OR)") {
    val g = glyphOf(Seq("#.", "##")) // mixed bits: XNOR output is distinctive
    val good = Jbig2.encodeEmbeddedText(Seq(g), Seq((0, 1, 1)), 6, 4)
    // symbol-dict flags bit 8 ("bitmap coding context used"): this
    // decoder cannot honour retained contexts -> None, never garble
    val ctxUsed = good.clone()
    ctxUsed(30 + 11) = (ctxUsed(30 + 11) | 0x01).toByte // flags high byte
    assert(Jbig2.decodeEmbedded(None, ctxUsed, 6, 4).isEmpty)
    // page-info striping bit 15: striped pages decode since r17 (the
    // page buffer comes from the PDF dims; regions carry absolute
    // coordinates) — same pixels as the unstriped stream
    val striped = good.clone()
    striped(11 + 17) = (striped(11 + 17) | 0x80).toByte
    assert(Jbig2.decodeEmbedded(None, striped, 6, 4).exists(
      _.sameElements(Jbig2.decodeEmbedded(None, good, 6, 4).get)))
    // region-info external comb op 5 -> None (was silently REPLACE)
    val w0 = 8; val h0 = 4
    val gen = Jbig2.encodeEmbedded(Array.fill(w0 * h0)(true), w0, h0)
    val badOp = gen.clone()
    badOp(30 + 11 + 16) = 5 // region segment info comb-op byte
    assert(Jbig2.decodeEmbedded(None, badOp, w0, h0).isEmpty)
    // text-region SBCOMBOP=3 (XNOR): pixels under the symbol become
    // the COMPLEMENT of its bits; untouched pixels stay 0
    val dictLen = {
      val o = 30 + 7
      ((good(o) & 0xff) << 24) | ((good(o + 1) & 0xff) << 16) |
        ((good(o + 2) & 0xff) << 8) | (good(o + 3) & 0xff)
    }
    // text header = 12 bytes (one referred-segment byte), then 17-byte
    // region segment info, then the 2-byte text-region flags
    val trFlagsAt = 30 + 11 + dictLen + 12 + 17
    val xnor = good.clone()
    val f = (((xnor(trFlagsAt) & 0xff) << 8) | (xnor(trFlagsAt + 1) & 0xff)) | (3 << 7)
    xnor(trFlagsAt) = (f >>> 8).toByte; xnor(trFlagsAt + 1) = f.toByte
    val page = Jbig2.decodeEmbedded(None, xnor, 6, 4).get
    val expect = new Array[Boolean](6 * 4)
    for (yy <- 0 until 2; xx <- 0 until 2)
      expect((1 + yy) * 6 + (1 + xx)) = !g._3(yy * 2 + xx)
    assert(page.sameElements(expect))
  }

  test("fail-closed: Huffman-coded dictionaries, unknown data length, " +
       "truncation, and oversized regions all yield None (never throw)") {
    val w = 8; val h = 4
    val px = Array.fill(w * h)(false)
    val good = Jbig2.encodeEmbedded(px, w, h)
    // a halftone-region type in the walk → None (out of envelope);
    // note retyping page info to a symbol dict (type 0) decodes as a
    // LEGAL zero-symbol dictionary — leniency, not a hole
    val halftone = good.clone(); halftone(4) = 20 // page-info header → type 20
    assert(Jbig2.decodeEmbedded(None, halftone, w, h).isEmpty)
    // Huffman-coded dictionary (SDHUFF=1) fails closed up front
    val g = glyphOf(Seq("#"))
    val txt = Jbig2.encodeEmbeddedText(Seq(g), Seq((0, 0, 0)), 4, 4)
    val huff = txt.clone()
    huff(30 + 11 + 1) = (huff(30 + 11 + 1) | 0x01).toByte // dict flags low byte
    assert(Jbig2.decodeEmbedded(None, huff, 4, 4).isEmpty)
    // unknown data length 0xFFFFFFFF
    val unk = good.clone()
    for (i <- 7 until 11) unk(i) = 0xFF.toByte
    assert(Jbig2.decodeEmbedded(None, unk, w, h).isEmpty)
    // truncated mid-header / mid-data
    assert(Jbig2.decodeEmbedded(None, good.take(5), w, h).isEmpty)
    assert(Jbig2.decodeEmbedded(None, good.dropRight(3), w, h).isEmpty)
    // region larger than the PDF dims
    assert(Jbig2.decodeEmbedded(None, good, w - 1, h).isEmpty)
  }

  test("bit-flip fuzz: decodeEmbedded never throws on corrupted streams") {
    val w = 24; val h = 12
    val px = Array.tabulate(w * h)(i => (i * 7) % 13 < 5)
    val r = rnd
    for (mmr <- Seq(false, true); _ <- 0 until 300) {
      val m = Jbig2.encodeEmbedded(px, w, h, mmr = mmr)
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      Jbig2.decodeEmbedded(None, m, w, h) // Option either way
    }
    for (_ <- 0 until 200) {
      val junk = Array.fill(20 + r.nextInt(60))(r.nextInt(256).toByte)
      Jbig2.decodeEmbedded(None, junk, w, h)
    }
  }

  // ------------------------------------------------------- e2e in PDF

  private def imagePdf(imgDict: String, imgBytes: Array[Byte],
                       extra: Seq[(Int, String, Option[Array[Byte]])] = Nil): Array[Byte] = {
    val ISO = java.nio.charset.StandardCharsets.ISO_8859_1
    val content = "q 8 0 0 8 0 0 cm /Im1 Do Q"
    val bos = new java.io.ByteArrayOutputStream()
    def wr(s: String): Unit = bos.write(s.getBytes(ISO))
    wr("%PDF-1.5\n")
    for ((num, dict, stream) <- Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO))),
      (5, s"$imgDict /Length ${imgBytes.length} >>", Some(imgBytes))) ++ extra) {
      wr(s"$num 0 obj\n$dict\n")
      stream.foreach { st => wr("stream\n"); bos.write(st); wr("\nendstream\n") }
      wr("endobj\n")
    }
    wr("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  private def onlyImage(pdf: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val Right(pages) = graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    pages.flatMap(_._2).headOption.map(b =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
  }

  test("JBIG2 payload e2e: an XObject decodes to the planted bilevel " +
       "PNG; /Decode [1 0] inverts; /JBIG2Globals resolves") {
    val w = 16; val h = 6
    val px = Array.tabulate(w * h)(i => i % w >= 10) // right 6 cols black
    val stream = Jbig2.encodeEmbedded(px, w, h)
    def dict(extra: String) =
      s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 1 " +
        s"/ColorSpace /DeviceGray $extra/Filter /JBIG2Decode"
    val img = onlyImage(imagePdf(dict(""), stream)).get
    assert(img.getWidth == w && img.getHeight == h)
    assert((img.getRGB(0, 0) & 0xFFFFFF) == 0xFFFFFF, "white background")
    assert((img.getRGB(12, 3) & 0xFFFFFF) == 0x000000, "black region")
    val inv = onlyImage(imagePdf(dict("/Decode [1 0] "), stream)).get
    assert((inv.getRGB(0, 0) & 0xFFFFFF) == 0x000000)
    assert((inv.getRGB(12, 3) & 0xFFFFFF) == 0xFFFFFF)
    // globals split through /DecodeParms /JBIG2Globals
    val globals = java.util.Arrays.copyOfRange(stream, 0, 30)
    val rest = java.util.Arrays.copyOfRange(stream, 30, stream.length)
    val gImg = onlyImage(imagePdf(
      dict("/DecodeParms << /JBIG2Globals 7 0 R >> "), rest,
      extra = Seq((7, s"<< /Length ${globals.length} >>", Some(globals))))).get
    assert((gImg.getRGB(12, 3) & 0xFFFFFF) == 0x000000)
    // a Flate pre-filter before JBIG2Decode rides the same chain
    val d = new java.util.zip.Deflater()
    d.setInput(stream); d.finish()
    val buf = new Array[Byte](stream.length + 64)
    val n = d.deflate(buf); d.end()
    val fImg = onlyImage(imagePdf(
      s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 1 " +
        "/ColorSpace /DeviceGray /Filter [/FlateDecode /JBIG2Decode]",
      buf.take(n))).get
    assert((fImg.getRGB(12, 3) & 0xFFFFFF) == 0x000000)
  }
}

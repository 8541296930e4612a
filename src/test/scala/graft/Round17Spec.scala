package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CcittG4, Jbig2, MiniPdf, PdfFunction}

/** Round-17 hardening specs — the r16 ADVICE items: the Type 2 /N
  * regex defeated by backtracking on multi-digit indirect refs, the
  * Int-overflowing JBIG2 export-run bound, general-/Decode handling on
  * the bilevel (CCITT/JBIG2) raster legs, and JBIG2 intermediate
  * (type 36) generic regions compositing like immediate ones. */
class Round17Spec extends AnyFunSuite {

  private val ISO = java.nio.charset.StandardCharsets.ISO_8859_1

  // --------------------------- PdfFunction /N indirect-ref regression

  private def fnObjs(nValue: String): Map[Int, MiniPdf.PdfObj] = Map(
    8 -> MiniPdf.PdfObj(8, "<< /FunctionType 2 /Domain [0 1] " +
      s"/C0 [0] /C1 [1] /N $nValue >>", None),
    12 -> MiniPdf.PdfObj(12, "<< /Type /SomeTarget >>", None))

  test("Type 2 /N with a MULTI-digit indirect ref fails closed (the " +
       "backtracking defeat: '/N 12 0 R' must not evaluate as N=1)") {
    assert(PdfFunction.build(fnObjs("12 0 R"), 8).isEmpty,
      "indirect /N 12 0 R must not silently become N=1")
    // single-digit indirect (the case the original lookahead caught)
    assert(PdfFunction.build(fnObjs("9 0 R"), 8).isEmpty)
  }

  test("Type 2 inline /N still parses: N=12 gives t^12 interpolation") {
    val f = PdfFunction.build(fnObjs("12"), 8)
    assert(f.isDefined)
    assert(f.get(1.0).sameElements(Array(1.0)))
    val half = f.get(0.5)(0)
    assert(math.abs(half - math.pow(0.5, 12)) < 1e-12, s"got $half")
    // and N followed by another key is not mistaken for an indirect ref
    val g = PdfFunction.build(Map(8 -> MiniPdf.PdfObj(8,
      "<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [1] /N 2 /Foo true >>",
      None)), 8)
    assert(g.isDefined && math.abs(g.get(0.5)(0) - 0.25) < 1e-12)
  }

  // ----------------------- JBIG2 export-run Int-overflow regression

  test("symbol-dict export run near Int.MaxValue at i>=1 returns None " +
       "(the 'i + run' sum wraps negative and used to pass the bound)") {
    // a VALID dictionary exporting two glyphs, so the hostile dict's
    // import list has length 2 and the first run can advance i to 1
    val g1 = (2, 2, Array(true, true, true, false))
    val g2 = (1, 3, Array(true, false, true))
    val full = Jbig2.encodeEmbeddedText(Seq(g1, g2), Seq((0, 1, 1)), 8, 8)
    val dictLen = {
      val o = 30 + 7 // page info is 30 bytes; data length at header+7
      (((full(o) & 0xff) << 24) | ((full(o + 1) & 0xff) << 16) |
        ((full(o + 2) & 0xff) << 8) | (full(o + 3) & 0xff))
    }
    val prefix = java.util.Arrays.copyOfRange(full, 0, 30 + 11 + dictLen)
    // hostile dict segment #2 referring to #1: numNew=0, export runs
    // (1, Int.MaxValue) — the second run, clamped by MqInt, must be
    // rejected by arithmetic that cannot overflow
    val mq = new Jbig2.MqEncoder
    val iaex = new Jbig2.MqInt
    iaex.encode(mq, Some(1))
    iaex.encode(mq, Some(Int.MaxValue))
    val mqData = mq.flush()
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(prefix)
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u32(v: Long): Unit = {
      u8((v >>> 24).toInt); u8((v >>> 16).toInt); u8((v >>> 8).toInt); u8(v.toInt)
    }
    u32(2); u8(0) // segment 2, type 0 (symbol dictionary)
    u8(1 << 5); u8(1) // one referred segment: #1
    u8(1) // page association
    val dataLen = 2 + 8 + 8 + mqData.length
    u32(dataLen.toLong)
    u8(0); u8(0) // flags: SDHUFF=0, SDREFAGG=0, template 0
    (0 until 8).foreach(_ => u8(0)) // AT pixels
    u32(1L) // numEx
    u32(0L) // numNew: straight to the export runs over imports
    bos.write(mqData)
    val hostile = bos.toByteArray
    // must return None — never throw (fill(ex, 1, Int.MinValue, ...))
    assert(Jbig2.decodeEmbedded(None, hostile, 8, 8).isEmpty)
  }

  // ------------------- JBIG2 intermediate (type 36) generic regions

  test("type 36 intermediate generic region fails closed instead of " +
       "compositing like an immediate region") {
    val w = 16; val h = 8
    val px = Array.tabulate(w * h)(i => i % w >= 6)
    val good = Jbig2.encodeEmbedded(px, w, h)
    assert(Jbig2.decodeEmbedded(None, good, w, h).exists(_.sameElements(px)))
    // the region segment header starts at 30; its type byte is at +4
    val patched = good.clone()
    assert((patched(34) & 0x3f) == 39, "fixture emits immediate lossless")
    patched(34) = (patched(34) & ~0x3f | 36).toByte
    assert(Jbig2.decodeEmbedded(None, patched, w, h).isEmpty,
      "an intermediate region is refinement INPUT, not page content")
  }

  // --------------- bilevel legs: general /Decode arrays (tri-state)

  private def rawPdf(objects: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO))
    w("%PDF-1.5\n")
    for ((num, dict, stream) <- objects) {
      w(s"$num 0 obj\n$dict\n")
      stream.foreach { data => w("stream\n"); bos.write(data); w("\nendstream\n") }
      w("endobj\n")
    }
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  private def imagePdf(imgDict: String, imgBytes: Array[Byte]): Array[Byte] = {
    val content = "q 8 0 0 8 0 0 cm /Im1 Do Q"
    rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO))),
      (5, s"$imgDict /Length ${imgBytes.length} >>", Some(imgBytes))))
  }

  private def onlyImage(pdf: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val Right(pages) = graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    pages.flatMap(_._2).headOption.map(b =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
  }

  test("CCITT leg honours a GENERAL /Decode array ([0 0.5] maps white " +
       "to mid-gray), and an indirect /Decode drops the image") {
    val w = 12; val h = 4
    val split = 5
    val px = Array.tabulate(w * h)(i => i % w < split) // left black
    val g4 = CcittG4.encode(px, w, h)
    def dict(decode: String) =
      s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 1 " +
        s"/ColorSpace /DeviceGray $decode/Filter /CCITTFaxDecode " +
        s"/DecodeParms << /K -1 /Columns $w /Rows $h >>"
    val img = onlyImage(imagePdf(dict("/Decode [0 0.5] "), g4))
    assert(img.isDefined)
    val gBlack = img.get.getRGB(0, 0) & 0xff
    val gWhite = img.get.getRGB(w - 1, 0) & 0xff
    assert(gBlack == 0, s"sample 0 -> decode 0.0 -> 0, got $gBlack")
    assert(gWhite == 128, s"sample 1 -> decode 0.5 -> 128, got $gWhite")
    // default decode unchanged
    val plain = onlyImage(imagePdf(dict(""), g4)).get
    assert((plain.getRGB(0, 0) & 0xff) == 0 &&
      (plain.getRGB(w - 1, 0) & 0xff) == 255)
    // present-but-unusable: indirect ref and wrong arity both drop
    assert(onlyImage(imagePdf(dict("/Decode 9 0 R "), g4)).isEmpty)
    assert(onlyImage(imagePdf(dict("/Decode [0 1 0] "), g4)).isEmpty)
  }

  test("JBIG2 leg: general /Decode range maps black through d0, and a " +
       "malformed /Decode drops the image instead of defaulting") {
    val w = 14; val h = 6
    val px = Array.tabulate(w * h)(i => i % w >= 9) // right black
    val stream = Jbig2.encodeEmbedded(px, w, h)
    def dict(decode: String) =
      s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 1 " +
        s"/ColorSpace /DeviceGray $decode/Filter /JBIG2Decode"
    val img = onlyImage(imagePdf(dict("/Decode [0.25 1] "), stream))
    assert(img.isDefined)
    val gBlack = img.get.getRGB(w - 1, 0) & 0xff
    val gWhite = img.get.getRGB(0, 0) & 0xff
    assert(gBlack == 64, s"black -> decode 0.25 -> 64, got $gBlack")
    assert(gWhite == 255, s"white -> decode 1.0 -> 255, got $gWhite")
    assert(onlyImage(imagePdf(dict("/Decode [0 1 0] "), stream)).isEmpty)
    assert(onlyImage(imagePdf(dict("/Decode 7 0 R "), stream)).isEmpty)
  }

  test("SMask /Decode: a general range rescales alpha; a malformed " +
       "mask /Decode drops the ALPHA (opaque fallback, same contract " +
       "as a dims-mismatched mask) rather than rendering wrong alpha") {
    val w = 6; val h = 4
    val rgb = Array.tabulate(w * h * 3)(_ => 100.toByte)
    val mask = Array.fill(w * h)(200.toByte)
    def pdf(maskDecode: String) = {
      val content = "q 8 0 0 8 0 0 cm /Im1 Do Q"
      rawPdf(Seq(
        (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
        (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
          "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
        (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO))),
        (5, s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 8 " +
          s"/ColorSpace /DeviceRGB /SMask 7 0 R /Length ${rgb.length} >>",
          Some(rgb)),
        (7, s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 8 " +
          s"/ColorSpace /DeviceGray $maskDecode/Length ${mask.length} >>",
          Some(mask))))
    }
    val img = onlyImage(pdf("/Decode [0 0.5] ")).get
    val a = (img.getRGB(0, 0) >>> 24) & 0xff
    // sample 200/255 through [0, 0.5] = 0.392..., ×255 rounded = 100
    assert(a == 100, s"alpha through [0 0.5] should be 100, got $a")
    val inv = onlyImage(pdf("/Decode [1 0] ")).get
    assert(((inv.getRGB(0, 0) >>> 24) & 0xff) == 55) // 255-200
    val bad = onlyImage(pdf("/Decode [0 1 0] ")).get
    assert(!bad.getColorModel.hasAlpha,
      "mask with malformed /Decode must not fabricate an alpha channel")
  }

  // ------------------------------- JPX payloads (VERDICT r16 item 1)

  test("Jpx.sizDims: raw codestream, JP2 container, LBox=0 jp2c, and " +
       "nonzero canvas offsets all parse the planted dims") {
    for (id <- 0L until 40L) {
      val pdf = PdfFixtures.jpxDoc(id)
      val w = 20 + (id % 16).toInt; val h = 12 + (id % 10).toInt
      val nc = 1 + (id % 3).toInt
      // pull the payload back out of the fixture via the production
      // decode path — it must surface VERBATIM
      val Right(pages) =
        graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
      val payloads = pages.flatMap(_._2)
      assert(payloads.length == 1, s"id=$id: JPX payload must surface")
      assert(graft.sources.Jpx.isJpx(payloads.head))
      assert(graft.sources.Jpx.sizDims(payloads.head).contains((w, h, nc)),
        s"id=$id")
    }
  }

  test("JPX feature extraction: dims from SIZ, luminance/alpha ABSENT " +
       "(never fabricated); decodeMeta tags format jp2 with channels") {
    val spark = TestSpark.spark
    import spark.implicits._
    val Right(pages) = graft.sources.MiniPdfDecoder()
      .decodeWithImages(PdfFixtures.jpxDoc(7L)): @unchecked
    val payload = pages.flatMap(_._2).head
    val df = Seq((7L, payload)).toDF("doc_id", "media")
    val feats = graft.operators.Multimodal.extractImageFeatures(df).collect()
    assert(feats.length == 1)
    assert(feats.head.width == 20 + 7 % 16 && feats.head.height == 12 + 7 % 10)
    assert(feats.head.lum.isEmpty && feats.head.alpha.isEmpty,
      "JPX luminance must be absent, not fabricated")
    val meta = graft.operators.Multimodal.JdkImageCodec.decodeMeta(payload)
    assert(meta.format == "jp2" && meta.channels == 1 + (7 % 3).toInt &&
      meta.width == feats.head.width && meta.height == feats.head.height)
  }

  test("JPX fail-closed: torn SIZ, Lsiz law violation, and non-JPX " +
       "bytes behind /JPXDecode all drop; bit-flip fuzz never throws") {
    val goodPdf = PdfFixtures.jpxDoc(4L)
    val Right(pages) =
      graft.sources.MiniPdfDecoder().decodeWithImages(goodPdf): @unchecked
    val payload = pages.flatMap(_._2).head
    // truncation at every cut point: Option either way, never a throw
    for (cut <- 1 until payload.length)
      graft.sources.Jpx.sizDims(payload.take(cut))
    assert(graft.sources.Jpx.sizDims(payload.take(20)).isEmpty)
    // Lsiz law: corrupt the SIZ length field
    val sizAt = {
      var i = 0
      while (!((payload(i) & 0xff) == 0xFF && (payload(i + 1) & 0xff) == 0x51)) i += 1
      i
    }
    val badLsiz = payload.clone()
    badLsiz(sizAt + 3) = (badLsiz(sizAt + 3) ^ 0x01).toByte
    assert(graft.sources.Jpx.sizDims(badLsiz).isEmpty,
      "Lsiz != 38 + 3*Csiz must fail closed")
    // non-JPX bytes behind /JPXDecode: the XObject drops entirely
    val junk = "this is not a codestream at all..".getBytes(ISO)
    val junkPdf = PdfFixtures.imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width 8 /Height 8 /BitsPerComponent 8 " +
        s"/ColorSpace /DeviceRGB /Filter /JPXDecode /Length ${junk.length} >>",
        Some(junk))))
    val Right(junkPages) =
      graft.sources.MiniPdfDecoder().decodeWithImages(junkPdf): @unchecked
    assert(junkPages.flatMap(_._2).isEmpty)
    // bit-flip fuzz over the whole fixture PDF
    val r = new scala.util.Random(17)
    for (_ <- 0 until 300) {
      val m = goodPdf.clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      graft.sources.MiniPdfDecoder().decodeWithImages(m) // Either way, no throw
    }
  }

  // ------------------------- CIE color spaces (/Lab, /CalRGB, /CalGray)

  test("/Lab rasters: L*=100 lands white, L*=0 black, and a known " +
       "mid-tone matches the hand-computed Lab->XYZ->linear-sRGB value") {
    val w = 4; val h = 3
    def labPdf(ls: Int, as_ : Int, bs: Int) = {
      val px = new Array[Byte](w * h * 3)
      for (i <- 0 until w * h) {
        px(3 * i) = ls.toByte; px(3 * i + 1) = as_.toByte
        px(3 * i + 2) = bs.toByte
      }
      imagePdf(s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 8 /ColorSpace [/Lab << " +
        "/WhitePoint [0.9642 1.0 0.8249] >>]", px)
    }
    // L*=100 (sample 255), a*=b*=0 (sample 127.5 unreachable; use the
    // neutral-ish 128) -> near-white; exact check via the replayed math
    def expectRgb(ls: Int, as_ : Int, bs: Int): (Int, Int, Int) = {
      val L = ls * 100.0 / 255.0
      val a = -100 + as_ * 200.0 / 255.0
      val b = -100 + bs * 200.0 / 255.0
      val fy = (L + 16.0) / 116.0
      val fx = fy + a / 500.0; val fz = fy - b / 200.0
      def g(t: Double) = if (t >= 6.0 / 29.0) t * t * t
        else (108.0 / 841.0) * (t - 4.0 / 29.0)
      val x = 0.9642 * g(fx); val y = 1.0 * g(fy); val z = 0.8249 * g(fz)
      def by(v: Double) =
        math.floor(255.0 * math.max(0.0, math.min(1.0, v)) + 0.5).toInt
      (by(3.2406 * x - 1.5372 * y - 0.4986 * z),
        by(-0.9689 * x + 1.8758 * y + 0.0415 * z),
        by(0.0557 * x - 0.2040 * y + 1.0570 * z))
    }
    for ((ls, as_, bs) <- Seq((255, 128, 128), (0, 128, 128), (180, 60, 200))) {
      val img = onlyImage(labPdf(ls, as_, bs))
      assert(img.isDefined, s"($ls,$as_,$bs)")
      val rgb = img.get.getRGB(0, 0)
      val got = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      assert(got == expectRgb(ls, as_, bs), s"($ls,$as_,$bs): got $got")
    }
    // L*=0 with neutral a/b must be black regardless of whitepoint
    val black = onlyImage(labPdf(0, 128, 128)).get.getRGB(0, 0)
    assert((black & 0xffffff) <= 0x030303)
  }

  test("/Lab fail-closed + /CalRGB//CalGray alias: missing WhitePoint " +
       "or malformed Range drop; Cal spaces decode as device aliases") {
    val w = 3; val h = 2
    val px3 = Array.tabulate(w * h * 3)(i => (40 + i % 3 * 60).toByte)
    assert(onlyImage(imagePdf(s"<< /Subtype /Image /Width $w /Height $h " +
      "/BitsPerComponent 8 /ColorSpace [/Lab << /Range [-50 50 -50 50] >>]",
      px3)).isEmpty, "Lab without WhitePoint must fail closed")
    assert(onlyImage(imagePdf(s"<< /Subtype /Image /Width $w /Height $h " +
      "/BitsPerComponent 8 /ColorSpace [/Lab << " +
      "/WhitePoint [0.9642 1.0 0.8249] /Range [-50 50] >>]",
      px3)).isEmpty, "Lab with wrong-arity Range must fail closed")
    val cal = onlyImage(imagePdf(s"<< /Subtype /Image /Width $w /Height $h " +
      "/BitsPerComponent 8 /ColorSpace [/CalRGB << " +
      "/WhitePoint [0.9505 1.0 1.089] >>]", px3))
    assert(cal.isDefined && (cal.get.getRGB(0, 0) & 0xffffff) == 0x2864a0)
    val gray = onlyImage(imagePdf(s"<< /Subtype /Image /Width $w /Height $h " +
      "/BitsPerComponent 8 /ColorSpace [/CalGray << " +
      "/WhitePoint [0.9505 1.0 1.089] >>]", Array.fill(w * h)(90.toByte)))
    assert(gray.isDefined && (gray.get.getRGB(0, 0) & 0xffffff) == 0x5a5a5a)
  }

  // ---------------- phashNearDups scopeCols (VERDICT r16 item 4)

  test("phashNearDups scopeCols: band and exact tiers are sharded by " +
       "the scope key — no cross-scope edges, full in-scope recall, " +
       "and empty scopeCols preserves the global semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = 0x0F0F0F0F0F0F0F0FL
    val b = a ^ (1L << 3) // hamming 1 from a
    // scope "x": exact group {1,2} on a, near neighbor 3 on b
    // scope "y": the SAME hashes on ids {11, 13} — must NOT join x's
    val df = Seq((1L, a, "x"), (2L, a, "x"), (3L, b, "x"),
      (11L, a, "y"), (13L, b, "y")).toDF("doc_id", "phash", "scope")
    val scoped = graft.operators.Dedup.phashNearDups(df,
        scopeCols = Seq("scope"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scoped == Set((1L, 2L, 0L), (1L, 3L, 1L), (11L, 13L, 1L)),
      s"got $scoped")
    // global (default) semantics: one exact group {1,2,11} and near
    // edges between the a-group rep and each b id's rep
    val global = graft.operators.Dedup.phashNearDups(df.drop("scope"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(global == Set((1L, 2L, 0L), (1L, 11L, 0L), (3L, 13L, 0L),
      (1L, 3L, 1L)), s"got $global")
  }

  // --------------------------- compressed-audio metadata (r17)

  test("FLAC/MP3 header metadata: planted values round-trip through " +
       "audioMeta for all fixture legs; WAV still rides javax.sound " +
       "(r18: the fixture cycles five legs — Opus and AAC joined)") {
    import graft.operators.Multimodal
    for (id <- 0L until 40L) {
      val m = Multimodal.audioMeta(PdfFixtures.audioDoc(id))
      assert(m.isDefined, s"id=$id")
      (id % 5).toInt match {
        case 0 =>
          assert(m.get.format == "flac" &&
            m.get.sampleRateHz == Array(44100, 48000, 32000, 22050)((id % 4).toInt) &&
            m.get.channels == 1 + (id % 2).toInt &&
            m.get.frames == 1000L + id % 5000, s"id=$id: ${m.get}")
        case 1 =>
          assert(m.get.format == "mp3" &&
            m.get.sampleRateHz == Array(44100, 48000, 32000)((id % 3).toInt) &&
            m.get.channels == (if (id % 2 == 0) 2 else 1) &&
            m.get.frames == (2 + id % 6) * 1152, s"id=$id: ${m.get}")
        case 2 =>
          assert(m.get.format == "wav" &&
            m.get.sampleRateHz == 8000 + (id % 4).toInt * 4000 &&
            m.get.frames == 500L + id % 100, s"id=$id: ${m.get}")
        case 3 =>
          assert(m.get.format ==
            (if (id % 10 == 8) "vorbis" else "opus") &&
            m.get.sampleRateHz == Array(48000, 44100, 16000, 24000)((id % 4).toInt) &&
            m.get.channels == 1 + (id % 2).toInt &&
            m.get.frames == 3000L + id % 4000, s"id=$id: ${m.get}")
        case _ =>
          assert(m.get.format == "aac" &&
            m.get.sampleRateHz == Array(48000, 44100, 32000)((id % 3).toInt) &&
            m.get.channels == 1 + (id % 2).toInt &&
            m.get.frames == (2 + id % 5) * 1024, s"id=$id: ${m.get}")
      }
    }
  }

  test("compressed-audio fail-closed: torn MP3 tails, mid-stream rate " +
       "changes, free-format bitrate, short FLAC, and junk all drop; " +
       "a trailing ID3v1 tag is tolerated") {
    import graft.operators.Multimodal
    val mp3 = PdfFixtures.audioDoc(1L) // MP3 leg
    assert(Multimodal.mp3Meta(mp3).isDefined)
    // torn tail: cut mid-frame
    assert(Multimodal.mp3Meta(mp3.take(mp3.length - 10)).isEmpty)
    // free-format bitrate (index 0) fails closed
    val free = mp3.clone()
    val firstFrame = 20 // ID3v2 header (10) + body (10)
    assert((free(firstFrame) & 0xff) == 0xFF)
    free(firstFrame + 2) = (free(firstFrame + 2) & 0x0f).toByte
    assert(Multimodal.mp3Meta(free).isEmpty)
    // ID3v1 trailer tolerated
    val tagged = mp3 ++ ("TAG" + "x" * 125).getBytes("ISO-8859-1")
    assert(Multimodal.mp3Meta(tagged).isDefined)
    assert(Multimodal.mp3Meta(tagged).get.frames ==
      Multimodal.mp3Meta(mp3).get.frames)
    // FLAC: truncated STREAMINFO drops
    val flac = PdfFixtures.audioDoc(0L)
    assert(Multimodal.flacMeta(flac.take(20)).isEmpty)
    // junk is not audio
    assert(Multimodal.audioMeta("certainly not audio".getBytes).isEmpty)
    // bit-flip fuzz: Option either way, never a throw
    val r = new scala.util.Random(5)
    for (leg <- 0L until 5L; _ <- 0 until 150) {
      val m = PdfFixtures.audioDoc(leg).clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      Multimodal.audioMeta(m)
    }
  }

  // ------------------------------- WebP header dims (r17)

  test("WebP dims: VP8/VP8L/VP8X planted dims and alpha flags round-" +
       "trip; torn headers and junk drop; decodeMeta tags format webp") {
    import graft.operators.Multimodal
    for (id <- 0L until 12L) {
      val d = Multimodal.webpDims(PdfFixtures.webpDoc(id))
      assert(d.isDefined, s"id=$id")
      assert(d.get._1 == 16 + (id % 200).toInt &&
        d.get._2 == 12 + (id % 120).toInt, s"id=$id: $d")
      if (id % 3 != 0) // VP8 lossy has no alpha bit
        assert(d.get._3 == (id % 2 == 1), s"id=$id alpha")
      val meta = Multimodal.JdkImageCodec.decodeMeta(PdfFixtures.webpDoc(id))
      assert(meta.format == "webp" && meta.width == d.get._1)
    }
    // extractImageFeatures: dims land, lum absent
    val spark = TestSpark.spark
    import spark.implicits._
    val feats = Multimodal.extractImageFeatures(
      Seq((4L, PdfFixtures.webpDoc(4L))).toDF("doc_id", "media")).collect()
    assert(feats.length == 1 && feats.head.lum.isEmpty)
    // fail-closed: bad VP8 start code, truncation, junk
    val bad = PdfFixtures.webpDoc(0L).clone()
    bad(23) = 0x00 // break the 9D 01 2A start code
    assert(Multimodal.webpDims(bad).isEmpty)
    for (cut <- 1 until 30) Multimodal.webpDims(PdfFixtures.webpDoc(1L).take(cut))
    assert(Multimodal.webpDims("RIFFxxxxNOPE then junk bytes..".getBytes).isEmpty)
  }

  // ------------------------------ EPUB / CBZ decode (r17)

  test("EPUB decode: spine-ordered chapters with planted word counts; " +
       "CBZ surfaces image payloads in name order through the router") {
    import graft.sources.{AutoPdfDecoder, Epub}
    for (id <- 0L until 9L) {
      val pages = AutoPdfDecoder().decode(PdfFixtures.epubDoc(id))
      assert(pages.isRight, s"id=$id")
      val pcount = 1 + (id % 3).toInt
      assert(pages.toOption.get.length == pcount)
      for ((p, c) <- pages.toOption.get.zipWithIndex) {
        val wc = p.replaceAll("<[^>]+>", " ").trim.split(" +").length
        assert(wc == 2 + ((id + c) % 7).toInt, s"id=$id ch$c")
      }
      // CBZ: one page per image, payloads decodable by the JDK codec
      val cbz = AutoPdfDecoder().decodeWithImages(PdfFixtures.cbzDoc(id))
      assert(cbz.isRight, s"id=$id cbz")
      val imgs = cbz.toOption.get.flatMap(_._2)
      assert(imgs.length == 1 + (id % 3).toInt)
      val img0 = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(imgs.head))
      assert(img0.getWidth == 6 + (id % 10).toInt)
    }
    // torn container.xml: EPUB chain fails, and (no image entries)
    // the ZIP is neither EPUB nor CBZ -> Left, never garbage pages
    val broken = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.putNextEntry(new java.util.zip.ZipEntry("META-INF/container.xml"))
      zos.write("<container>no rootfile here</container>".getBytes)
      zos.closeEntry(); zos.close()
      bos.toByteArray
    }
    // r18 (ADVICE r17): the ROUTER now falls back for a ZIP that is
    // no recognized document container — mixed corpora keep their
    // pre-r17 fallback behavior; the standalone EpubDecoder still
    // hard-fails, and the classifier says 'not a document'.
    assert(graft.sources.EpubDecoder().decode(broken).isLeft)
    assert(graft.sources.Epub.zipDocPages(broken).isEmpty)
    assert(graft.sources.AutoPdfDecoder().decode(broken) ==
      graft.sources.FakePdfDecoder().decode(broken))
    // non-ZIP payloads still route to the fallback (stable fixtures)
    assert(graft.sources.AutoPdfDecoder()
      .decode("plain text payload".getBytes).isRight)
    // byte-flip fuzz over a real EPUB: Either way, never a throw
    val good = PdfFixtures.epubDoc(4L)
    val r = new scala.util.Random(23)
    for (_ <- 0 until 200) {
      val m = good.clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      graft.sources.AutoPdfDecoder().decode(m)
    }
    for (cut <- 1 until good.length by 7)
      graft.sources.AutoPdfDecoder().decode(good.take(cut))
  }

  // ------------------------------ AVIF/HEIC dims (r17)

  test("AVIF/HEIC ispe dims: all three brands round-trip; a thumbnail " +
       "ispe never displaces the primary dims; torn boxes drop") {
    import graft.operators.Multimodal
    for (id <- 0L until 9L) {
      val d = Multimodal.avifDims(PdfFixtures.avifDoc(id))
      assert(d.isDefined, s"id=$id")
      assert(d.get._1 == 64 + (id % 300).toInt &&
        d.get._2 == 48 + (id % 200).toInt, s"id=$id: $d")
      assert(d.get._3 == Seq("avif", "heic", "mif1")((id % 3).toInt))
      val meta = Multimodal.JdkImageCodec.decodeMeta(PdfFixtures.avifDoc(id))
      assert(Set("avif", "heic", "heif").contains(meta.format))
    }
    // a plain MP4 (mp4-brand ftyp, no meta tree) is NOT an avif
    assert(graft.operators.Multimodal.avifDims(PdfFixtures.mp4Doc(1L)).isEmpty)
    // truncation + fuzz: Option either way
    val good = PdfFixtures.avifDoc(2L)
    for (cut <- 1 until good.length)
      graft.operators.Multimodal.avifDims(good.take(cut))
    val r = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val m = good.clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      graft.operators.Multimodal.avifDims(m)
    }
  }

  // --------------------------- video container metadata (r17)

  test("MP4 box walk: v0/v1 mvhd+tkhd planted values round-trip; an " +
       "audio-only 0x0 track never displaces the video dims") {
    import graft.operators.Multimodal
    for (id <- 0L until 12L) {
      val m = Multimodal.mp4Meta(PdfFixtures.mp4Doc(id))
      assert(m.isDefined, s"id=$id")
      val ts = 1000L + (id % 3) * 500
      val ticks = (2000L + id % 9000) * ts / 1000
      assert(m.get.durationMs == ticks * 1000 / ts, s"id=$id: ${m.get}")
      assert(m.get.width == 320 + (id % 16).toInt * 8 &&
        m.get.height == 180 + (id % 9).toInt * 20, s"id=$id: ${m.get}")
      assert(m.get.tracks == (if (id % 3 == 2) 2 else 1))
    }
  }

  test("MP4 fail-closed: missing moov/ftyp, zero timescale, unknown " +
       "version, torn boxes, and junk all drop; bit-flip fuzz never " +
       "throws") {
    import graft.operators.Multimodal
    val good = PdfFixtures.mp4Doc(5L)
    assert(Multimodal.mp4Meta(good).isDefined)
    // no ftyp: drop the first box
    val ftypLen = ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
      ((good(2) & 0xff) << 8) | (good(3) & 0xff)
    assert(Multimodal.mp4Meta(good.drop(ftypLen)).isEmpty)
    // torn: every truncation point returns Option, never throws
    for (cut <- 1 until good.length) Multimodal.mp4Meta(good.take(cut))
    assert(Multimodal.mp4Meta("not remotely a movie".getBytes).isEmpty)
    val r = new scala.util.Random(31)
    for (_ <- 0 until 400) {
      val m = good.clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      Multimodal.mp4Meta(m)
    }
  }

  // ---------------------------- striped pages (r17)

  test("striped pages decode: striping-info bit set + an end-of-stripe " +
       "segment between regions lands the same pixels as the unstriped " +
       "stream (regions carry absolute coordinates)") {
    val w = 16; val h = 10
    val px = Array.tabulate(w * h)(i => (i % w) >= 5)
    val plain = Jbig2.encodeEmbedded(px, w, h)
    val expect = Jbig2.decodeEmbedded(None, plain, w, h).get
    // set striping bit (page-info data byte 17, absolute 11+17=28) and
    // a max-stripe-size in the low bits
    val striped = new java.io.ByteArrayOutputStream()
    val head = plain.clone()
    head(28) = (head(28) | 0x80).toByte
    head(29) = 8 // max stripe rows
    striped.write(head, 0, 30) // page info only
    // end-of-stripe segment (type 50): 4-byte Y coordinate of the
    // stripe's last row
    striped.write(Array[Byte](0, 0, 0, 5, 50, 0, 1, 0, 0, 0, 4, 0, 0, 0, 7))
    striped.write(head, 30, head.length - 30) // the region segment
    val got = Jbig2.decodeEmbedded(None, striped.toByteArray, w, h)
    assert(got.isDefined, "striped page must decode")
    assert(got.get.sameElements(expect))
  }

  // ----------------------- r17 code-review regressions

  test("review: scopeCols with NULL scope values — null-scope rows form " +
       "their own scope (struct key null-safety), never silently drop") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = 0x1111222233334444L
    // two exact dups with NULL scope, one with scope "x": the null
    // pair must pair with each other, never with "x"
    val df = Seq((1L, a, Option.empty[String]), (2L, a, Option.empty[String]),
      (3L, a, Some("x"))).toDF("doc_id", "phash", "scope")
    val out = graft.operators.Dedup.phashNearDups(df, scopeCols = Seq("scope"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 0L)),
      s"null-scope dups must pair in their own scope, got $out")
  }

  test("review: hostile SIZ dims that overflow the Long product fail " +
       "closed instead of wrapping to negative Int dims") {
    import graft.sources.Jpx
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val siz = Array(0xFF.toByte, 0x4F.toByte, 0xFF.toByte, 0x51.toByte) ++
      be16(38 + 3) ++ be16(0) ++
      be32(0xFFFFFFFFL) ++ be32(0xFFFFFFFFL) ++ // Xsiz, Ysiz = 4G
      be32(0) ++ be32(0) ++ be32(0xFFFFFFFFL) ++ be32(0xFFFFFFFFL) ++
      be32(0) ++ be32(0) ++ be16(1) ++ Array[Byte](7, 1, 1)
    assert(Jpx.sizDims(siz).isEmpty,
      "4G x 4G dims overflow the product past the cap; must fail closed")
  }

  test("review: runcode 32 repeats the IMMEDIATELY previous length " +
       "including zero (not the last positive length)") {
    import graft.sources.Jbig2Huffman._
    val bw = new BitWriter
    val runLens = Array.tabulate(35) {
      case 0 => 2; case 5 => 2; case 32 => 2; case _ => 0
    } // runcodes {0, 5, 32} at length 2: canonical 00, 01, 10
    runLens.foreach(l => bw.write(l.toLong, 4))
    bw.write(0x1L, 2) // runcode 5: lens[0] = 5
    bw.write(0x0L, 2) // runcode 0: lens[1] = 0
    bw.write(0x2L, 2) // runcode 32: repeat PREVIOUS (= 0)
    bw.write(0L, 2) // 3 + 0 = 3 repeats -> lens[2..4] = 0
    bw.write(0x1L, 2) // runcode 5: lens[5] = 5 (table must stay sane)
    val data = bw.result()
    val br = new BitReader(data, 0, data.length)
    val table = readSymbolIdTable(br, 6)
    assert(table.isDefined)
    assert(table.get.lines.map(_.prefLen).toSeq == Seq(5, 0, 0, 0, 0, 5))
  }

  test("review: intermediate TEXT regions (type 4) fail closed like " +
       "intermediate generic (36) and halftone (20) regions") {
    val g = glyphOf(Seq("##", ".#"))
    val good = Jbig2.encodeEmbeddedText(Seq(g), Seq((0, 2, 1)), 10, 6)
    assert(Jbig2.decodeEmbedded(None, good, 10, 6).isDefined)
    // the text-region segment follows the dict; its type byte is at
    // header offset + 4 (header = 30 + 11 + dictLen)
    val dictLen = (((good(37) & 0xff) << 24) | ((good(38) & 0xff) << 16) |
      ((good(39) & 0xff) << 8) | (good(40) & 0xff))
    val trHdr = 30 + 11 + dictLen
    assert((good(trHdr + 4) & 0x3f) == 6, "fixture emits immediate (6)")
    val inter = good.clone()
    inter(trHdr + 4) = (inter(trHdr + 4) & ~0x3f | 4).toByte
    assert(Jbig2.decodeEmbedded(None, inter, 10, 6).isEmpty)
  }

  test("review: halftone regions exceeding the page bounds fail closed " +
       "before decode work; a single-pattern dict decodes ZERO planes") {
    val patterns2 = (0 until 5).map(k => Array.tabulate(4)(_ < k))
    val values2 = Array.tabulate(6)(i => i % 5)
    val stream = Jbig2.encodeEmbeddedHalftone(values2, 3, 2, patterns2, 2, 6, 4)
    // region is 6x4; a 5x4 page cannot hold it
    assert(Jbig2.decodeEmbedded(None, stream, 5, 4).isEmpty)
    // HNUMPATS = 1 -> HBPP = 0: no bitplanes, all cells pattern 0
    val solid = Seq(Array(true, true, true, false))
    val zs = Jbig2.encodeEmbeddedHalftone(Array.fill(4)(0), 2, 2, solid, 2, 4, 4)
    val page = Jbig2.decodeEmbedded(None, zs, 4, 4)
    assert(page.isDefined, "zero-bitplane halftone must decode")
    val expect = new Array[Boolean](16)
    for (m <- 0 until 2; n <- 0 until 2; yy <- 0 until 2; xx <- 0 until 2
         if solid.head(yy * 2 + xx))
      expect((m * 2 + yy) * 4 + (n * 2 + xx)) = true
    assert(page.get.sameElements(expect))
  }

  test("review: JPEG fill bytes (FF padding before markers) do not " +
       "derail the CMYK sniff or the Adobe transform read") {
    val spark = TestSpark.spark
    import spark.implicits._
    val payload = jpegPayloadOf(PdfFixtures.cmykJpegDoc(7L)) // Adobe shape
    // splice two 0xFF fill bytes right after SOI
    val filled = new Array[Byte](payload.length + 2)
    System.arraycopy(payload, 0, filled, 0, 2)
    filled(2) = 0xFF.toByte; filled(3) = 0xFF.toByte
    // the next byte is already 0xFF (the APP14 marker), forming
    // FF FF FF EE — two fills before one marker
    System.arraycopy(payload, 2, filled, 4, payload.length - 2)
    assert(graft.operators.Multimodal.jpegComponents(filled).contains(4))
    val feats = graft.operators.Multimodal.extractImageFeatures(
      Seq((7L, filled)).toDF("doc_id", "media")).collect()
    val base = graft.operators.Multimodal.extractImageFeatures(
      Seq((7L, payload)).toDF("doc_id", "media")).collect()
    assert(feats.length == 1 && base.length == 1)
    assert(feats.head.lum == base.head.lum,
      "fill bytes must not change the clamp luminance (Adobe inversion intact)")
  }

  // ------------------ JBIG2 Huffman class (VERDICT r16 item 2)

  private def glyphOf(pattern: Seq[String]): (Int, Int, Array[Boolean]) = {
    val h = pattern.length; val w = pattern.head.length
    (w, h, pattern.flatMap(_.map(_ == '#')).toArray)
  }

  test("Huffman symbol dict + text region round-trips and matches the " +
       "ARITHMETIC encoding of identical geometry, across uncompressed " +
       "and MMR collective bitmaps, plain and transposed strips") {
    val gA = glyphOf(Seq("###", "#.#", "###"))
    val gB = glyphOf(Seq("#..#", ".##.", ".##.", "#..#"))
    val gC = glyphOf(Seq("##", "##"))
    val pageW = 40; val pageH = 16
    val places = Seq((0, 2, 1), (1, 10, 1), (2, 20, 2), (0, 30, 9),
      (2, 6, 9), (1, 14, 10))
    val arith = Jbig2.decodeEmbedded(None,
      Jbig2.encodeEmbeddedText(Seq(gA, gB, gC), places, pageW, pageH),
      pageW, pageH).get
    for (mmr <- Seq(false, true); transposed <- Seq(false, true)) {
      val huff = Jbig2.encodeEmbeddedTextHuffman(Seq(gA, gB, gC), places,
        pageW, pageH, mmr = mmr, transposed = transposed)
      val page = Jbig2.decodeEmbedded(None, huff, pageW, pageH)
      assert(page.isDefined, s"mmr=$mmr transposed=$transposed")
      assert(page.get.sameElements(arith),
        s"mmr=$mmr transposed=$transposed: Huffman page != arithmetic page")
    }
  }

  test("Huffman class: multiple height classes (collective-bitmap " +
       "split by widths) and a single-glyph dictionary both decode") {
    // three DISTINCT heights force three height classes; two glyphs
    // share the tallest class to exercise the width split
    val g1 = glyphOf(Seq("##"))
    val g2 = glyphOf(Seq("#.", ".#"))
    val g3 = glyphOf(Seq("#..", "##.", "###"))
    val g4 = glyphOf(Seq(".#", ".#", "##"))
    val places = Seq((0, 1, 1), (1, 5, 1), (2, 9, 1), (3, 14, 1), (2, 1, 6))
    val huff = Jbig2.encodeEmbeddedTextHuffman(Seq(g1, g2, g3, g4), places, 20, 12)
    val arith = Jbig2.encodeEmbeddedText(Seq(g1, g2, g3, g4), places, 20, 12)
    val hp = Jbig2.decodeEmbedded(None, huff, 20, 12)
    val ap = Jbig2.decodeEmbedded(None, arith, 20, 12)
    assert(hp.isDefined && ap.isDefined && hp.get.sameElements(ap.get))
    // single glyph: symCodeLen = 1, one-entry symbol-ID table
    val solo = Jbig2.encodeEmbeddedTextHuffman(Seq(g3), Seq((0, 2, 3)), 10, 8)
    assert(Jbig2.decodeEmbedded(None, solo, 10, 8).isDefined)
  }

  test("standard-table spot checks: hand-assigned canonical codewords " +
       "decode the spec values (B.1, B.2 OOB, B.4 upper range)") {
    import graft.sources.Jbig2Huffman._
    def bitsOf(s: String): BitReader = {
      val clean = s.filter(c => c == '0' || c == '1')
      val bytes = new Array[Byte]((clean.length + 7) / 8)
      for (i <- clean.indices if clean(i) == '1')
        bytes(i / 8) = (bytes(i / 8) | (1 << (7 - i % 8))).toByte
      new BitReader(bytes, 0, bytes.length)
    }
    // B.1 PREFLENs {1,2,3,3} assign canonically: 0, 10, 110, 111
    assert(B1.decode(bitsOf("0 0101")) == Some(Some(5L)))
    assert(B1.decode(bitsOf("10 00000011")) == Some(Some(19L))) // 16+3
    assert(B1.decode(bitsOf("110 0000000000000001")) == Some(Some(273L)))
    // B.2 OOB carries PREFLEN 6 -> canonical '111111'... OOB code:
    // lengths {1,2,3,4,5,6,6}: codes 0,10,110,1110,11110,111110,111111
    assert(B2.decode(bitsOf("111111")) == Some(None))
    assert(B2.decode(bitsOf("0")) == Some(Some(0L)))
    assert(B2.decode(bitsOf("1110 101")) == Some(Some(8L))) // 3+5
    // B.4 upper range: lengths {1,2,3,4,5,5} -> 76+32-bit code '11111'
    assert(B4.decode(bitsOf("11111" + "0" * 31 + "1")) == Some(Some(77L)))
    // tear: not enough bits for the 32-bit suffix
    assert(B4.decode(bitsOf("11111" + "01")).isEmpty)
  }

  test("symbol-ID runcode table: repeat (32), small-zero (33) and " +
       "large-zero (34) runs reconstruct the planted code lengths") {
    import graft.sources.Jbig2Huffman._
    val bw = new BitWriter
    // runcode lengths: give runcodes {2,3,32,33,34} prefix lengths
    // {2,2,2,3,3}: canonical 00,01,10,110,111
    val runLens = Array.tabulate(35) {
      case 2 => 2; case 3 => 2; case 32 => 2; case 33 => 3; case 34 => 3
      case _ => 0
    }
    runLens.foreach(l => bw.write(l.toLong, 4))
    // plant: [3, 3,3,3,3 (32 run of 4), 2, 0,0,0 (33 run of 3),
    //         0*11 (34 run of 11)] = 20 symbols — Kraft-valid
    // (count(2)=1, count(3)=5; r18 rejects over-subscribed tables,
    // so the pre-r18 five-2-bit-codes plant is now correctly None)
    bw.write(0x1L, 2) // runcode 3 -> '01'
    bw.write(0x2L, 2) // runcode 32 -> '10'
    bw.write(1L, 2) // 3 + 1 = 4 repeats of previous (3)
    bw.write(0x0L, 2) // runcode 2 -> '00'
    bw.write(0x6L, 3) // runcode 33 -> '110'
    bw.write(0L, 3) // 3 + 0 zeroes
    bw.write(0x7L, 3) // runcode 34 -> '111'
    bw.write(0L, 7) // 11 + 0 zeroes
    val data = bw.result()
    val br = new BitReader(data, 0, data.length)
    val table = readSymbolIdTable(br, 20)
    assert(table.isDefined)
    val lens = table.get.lines.map(_.prefLen).toSeq
    assert(lens == Seq(3, 3, 3, 3, 3, 2, 0, 0, 0) ++ Seq.fill(11)(0),
      s"got $lens")
  }

  test("halftone region: Gray-coded bitplanes select planted patterns " +
       "per grid cell (exact pixels), incl. multi-plane gray values") {
    val pw = 3
    // pattern k = first k pixels black (row-major): 10 patterns ->
    // 4 bitplanes, so the Gray decode chain really runs
    val patterns = (0 until 10).map(k =>
      Array.tabulate(pw * pw)(_ < k))
    val hgw = 5; val hgh = 4
    val values = Array.tabulate(hgw * hgh)(i => (i * 7 + 3) % 10)
    val pageW = hgw * pw; val pageH = hgh * pw
    val stream = Jbig2.encodeEmbeddedHalftone(values, hgw, hgh,
      patterns, pw, pageW, pageH)
    val page = Jbig2.decodeEmbedded(None, stream, pageW, pageH)
    assert(page.isDefined, "halftone stream must decode")
    val expect = new Array[Boolean](pageW * pageH)
    for (m <- 0 until hgh; n <- 0 until hgw) {
      val p = patterns(values(m * hgw + n))
      for (yy <- 0 until pw; xx <- 0 until pw if p(yy * pw + xx))
        expect((m * pw + yy) * pageW + (n * pw + xx)) = true
    }
    assert(page.get.sameElements(expect), "planted pattern placement")
    // black count law the q388 oracle replays
    assert(page.get.count(identity) == values.sum)
  }

  test("halftone fail-closed + fuzz: intermediate (type 20) regions, " +
       "MMR-multiplexed gray planes, hostile gray values, bit flips " +
       "and truncations all return Option, never throw") {
    val patterns = (0 until 5).map(k => Array.tabulate(4)(_ < k))
    val values = Array.tabulate(6)(i => i % 5)
    val good = Jbig2.encodeEmbeddedHalftone(values, 3, 2, patterns, 2, 6, 4)
    assert(Jbig2.decodeEmbedded(None, good, 6, 4).isDefined)
    // patch the region segment type 23 -> 20 (intermediate): the
    // region header follows the pattern dict; find its header offset
    // via the dict's data length field at page-info(30) + 7
    val dictLen = (((good(37) & 0xff) << 24) | ((good(38) & 0xff) << 16) |
      ((good(39) & 0xff) << 8) | (good(40) & 0xff))
    val regHdr = 30 + 11 + dictLen
    assert((good(regHdr + 4) & 0x3f) == 23, "fixture emits type 23")
    val inter = good.clone()
    inter(regHdr + 4) = (inter(regHdr + 4) & ~0x3f | 20).toByte
    assert(Jbig2.decodeEmbedded(None, inter, 6, 4).isEmpty,
      "intermediate halftone regions are refinement input, fail closed")
    // MMR-multiplexed gray planes: flip HMMR (flags byte after the
    // 17-byte region info; the region header is 12 bytes — 11 plus
    // its one referred-segment byte)
    val mmr = good.clone()
    mmr(regHdr + 12 + 17) = (mmr(regHdr + 12 + 17) | 1).toByte
    assert(Jbig2.decodeEmbedded(None, mmr, 6, 4).isEmpty)
    val r = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val m = good.clone()
      val i = r.nextInt(m.length)
      m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
      Jbig2.decodeEmbedded(None, m, 6, 4)
    }
    for (cut <- 1 until good.length)
      Jbig2.decodeEmbedded(None, good.take(cut), 6, 4)
  }

  test("Huffman JBIG2 fuzz: bit flips and every truncation point " +
       "return Option, never throw or spin") {
    val g1 = glyphOf(Seq("###", ".#.")); val g2 = glyphOf(Seq("#", "#", "#"))
    for (mmr <- Seq(false, true)) {
      val good = Jbig2.encodeEmbeddedTextHuffman(Seq(g1, g2),
        Seq((0, 1, 1), (1, 8, 2), (0, 14, 8)), 20, 12, mmr = mmr)
      val r = new scala.util.Random(99)
      for (_ <- 0 until 300) {
        val m = good.clone()
        val i = r.nextInt(m.length)
        m(i) = (m(i) ^ (1 << r.nextInt(8))).toByte
        Jbig2.decodeEmbedded(None, m, 20, 12)
      }
      for (cut <- 1 until good.length)
        Jbig2.decodeEmbedded(None, good.take(cut), 20, 12)
    }
  }

  // -------------------- CMYK /DCTDecode features (VERDICT r16 item 5)

  private def jpegPayloadOf(pdf: Array[Byte]): Array[Byte] = {
    val Right(pages) =
      graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    pages.flatMap(_._2).head
  }

  test("CMYK JPEG features ride readRaster + the additive clamp: the " +
       "Adobe (inverted, APP14) and plain shapes land the SAME planted " +
       "luminance, NOT the color-managed SimpleCMYKColorSpace value") {
    val spark = TestSpark.spark
    import spark.implicits._
    // ids 6 and 7 share no planted values; compare each to its formula
    for (id <- Seq(6L, 7L, 20L, 33L)) {
      val payload = jpegPayloadOf(PdfFixtures.cmykJpegDoc(id))
      val (c, m, y, k) = (((id * 3) % 256).toInt, ((id * 7) % 256).toInt,
        ((id * 11) % 256).toInt, ((id * 5) % 256).toInt)
      val expect = 0.299 * (255 - math.min(255, c + k)) +
        0.587 * (255 - math.min(255, m + k)) +
        0.114 * (255 - math.min(255, y + k))
      val df = Seq((id, payload)).toDF("doc_id", "media")
      val feats = graft.operators.Multimodal.extractImageFeatures(df).collect()
      assert(feats.length == 1, s"id=$id: CMYK JPEG must yield features")
      assert(feats.head.width == 7 + (id % 9).toInt &&
        feats.head.height == 5 + (id % 7).toInt, s"id=$id dims")
      assert(math.abs(feats.head.lum.get - expect) < 1e-9,
        s"id=$id lum ${feats.head.lum} != clamp $expect")
      assert(feats.head.alpha.contains(1.0))
    }
  }

  test("CMYK JPEG fail-closed: a truncated 4-comp JPEG drops instead " +
       "of throwing; transform=2 decodes through the YCCK inverse (r19)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val payload = jpegPayloadOf(PdfFixtures.cmykJpegDoc(7L)) // Adobe shape
    // flip the APP14 transform byte 0 -> 2 (YCCK)
    var at = 2
    while (!((payload(at) & 0xff) == 0xFF && (payload(at + 1) & 0xff) == 0xEE))
      at += 1
    val ycck = payload.clone()
    assert((ycck(at + 15) & 0xff) == 0)
    ycck(at + 15) = 2
    val truncated = payload.take(payload.length / 2)
    val df = Seq((1L, ycck), (2L, truncated)).toDF("doc_id", "media")
    val feats = graft.operators.Multimodal.extractImageFeatures(df).collect()
    // r19 (VERDICT r18 Missing #4): transform=2 is IN envelope — the
    // relabeled payload decodes through the YCCK inverse (Round19Spec
    // pins the planted-value law); the torn payload still drops
    assert(feats.map(_.doc_id).toSeq == Seq(1L),
      "torn CMYK JPEGs drop; YCCK decodes since r19")
  }

  test("3-component JPEGs still ride the ImageIO path (the CMYK sniff " +
       "must not divert them)") {
    assert(graft.operators.Multimodal.jpegComponents(
      jpegPayloadOf(PdfFixtures.cmykJpegDoc(4L))).contains(4))
    assert(graft.operators.Multimodal.jpegComponents(
      jpegPayloadOf(PdfFixtures.imagePayloadDoc(3L))).contains(3))
    val spark = TestSpark.spark
    import spark.implicits._
    val rgbJpeg = jpegPayloadOf(PdfFixtures.imagePayloadDoc(3L))
    val df = Seq((3L, rgbJpeg)).toDF("doc_id", "media")
    val feats = graft.operators.Multimodal.extractImageFeatures(df).collect()
    assert(feats.length == 1 && feats.head.lum.isDefined)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening specs: the star-shaped exact tier of
  * [[graft.operators.Dedup.phashNearDups]] (VERDICT r15 item 1 — a hot
  * hash must emit g−1 edges, not C(g,2)), plus the r15 ADVICE items
  * (SJIS kanji-with-ASCII-trail recall, Arrow shard commit hygiene,
  * `post`-table boundary). */
class Round16Spec extends AnyFunSuite {

  // ------------------------------------------- phash star-edge scaling

  test("phashNearDups hot hash: a 10k-member identical-hash group emits " +
       "g-1 star edges (never the C(g,2) clique)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val hot = 0x5A5A5A5A5A5A5A5AL
    // 10_000 docs share one hash (ids 100..10_099, min = 100) plus two
    // far-away singletons that must not join anything
    val df = ((100L until 10100L).map(_ -> hot) ++
      Seq(1L -> 0x0123456789ABCDEFL, 2L -> ~0x0123456789ABCDEFL))
      .toDF("doc_id", "phash")
    val out = graft.operators.Dedup.phashNearDups(df).collect()
    assert(out.length == 9999, s"expected g-1 = 9999 edges, got ${out.length}")
    assert(out.forall(r => r.getLong(0) == 100L && r.getLong(2) == 0L),
      "every exact edge must anchor at the group-min representative")
    assert(out.map(_.getLong(1)).toSet == (101L until 10100L).toSet)
  }

  test("phashNearDups near tier emits ONE representative edge per " +
       "qualifying hash pair, not the gA*gB id expansion") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = 0x00FF00FF00FF00FFL
    val b = a ^ (1L << 17) // hamming 1 from a
    // group A = {10, 11, 12}, group B = {20, 21}: all-pairs would list
    // 6 cross edges; representatives are 10 and 20
    val df = Seq(10L -> a, 11L -> a, 12L -> a, 20L -> b, 21L -> b)
      .toDF("doc_id", "phash")
    val out = graft.operators.Dedup.phashNearDups(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 11L, 0L), (10L, 12L, 0L), (20L, 21L, 0L),
      (10L, 20L, 1L)))
    // downstream transitive grouping still collapses A ∪ B into one
    val groups = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.phashNearDups(df)
        .select($"key_a", $"key_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L, 20L, 21L).map(groups).distinct.size == 1)
  }

  // --------------------------------------- SJIS recall (r16 ADVICE)

  test("kanji-heavy Shift_JIS dominated by 0x91-0x97 leads with ASCII " +
       "trails still detects as SJIS (recall, not just precision)") {
    val sjis = java.nio.charset.Charset.forName("Shift_JIS")
    // harvest real characters by their encoded shape: 'band' = lead in
    // 0x91..0x97 with an ASCII-range trail (the windows-125x-lookalike
    // pair the precision gate discounts), 'strong' = any other two-byte
    // SJIS pair with lead in 0x81..0x9F
    def shape(cp: Int): Option[(Char, Boolean)] = {
      val ch = cp.toChar
      val b = ch.toString.getBytes(sjis)
      if (b.length != 2) return None
      val lead = b(0) & 0xff; val trail = b(1) & 0xff
      if (lead < 0x81 || lead > 0x9F) return None
      if (trail < 0x40 || trail > 0xFC || trail == 0x7F) return None
      // charset must round-trip (reject substitution chars)
      if (new String(b, sjis) != ch.toString) return None
      Some((ch, lead >= 0x91 && lead <= 0x97 && trail < 0x80))
    }
    val harvested = (0x4E00 to 0x9FFF).iterator.flatMap(shape).toSeq
    val band = harvested.filter(_._2).map(_._1).take(10)
    val strong = harvested.filterNot(_._2).map(_._1).take(6)
    assert(band.size == 10 && strong.size == 6, "fixture harvest")
    // 10 band pairs vs 6 strong pairs: the old strong >= punct gate
    // flipped this legal SJIS page to windows-1252
    val text = (band ++ strong).mkString("")
    val bytes = s"<html><body>$text</body></html>".getBytes(sjis)
    assert(!graft.functions.Dom.isValidUtf8(bytes))
    assert(graft.functions.Dom.detectEncoding(bytes).name == "Shift_JIS")
    assert(graft.functions.Dom.decodeHtml(bytes).contains(band.head))
  }

  // ----------------------------------- CPU-kernel fan-out (r16)

  test("documentsFanned spreads the per-doc kernel input across the " +
       "session's full parallelism (a small parquet file is ONE byte-" +
       "based split otherwise)") {
    val spark = TestSpark.spark
    val plain = Tables.documents(spark, TestSpark.sf0001).rdd.getNumPartitions
    val fanned = Tables.documentsFanned(spark, TestSpark.sf0001)
      .rdd.getNumPartitions
    assert(fanned == spark.sparkContext.defaultParallelism,
      s"fanned=$fanned parallelism=${spark.sparkContext.defaultParallelism}")
    assert(plain < fanned,
      s"fixture premise: the raw scan ($plain) is narrower than the fan-out")
    // row set unchanged — it is a pure repartition
    assert(Tables.documentsFanned(spark, TestSpark.sf0001).count() ==
      Tables.documents(spark, TestSpark.sf0001).count())
  }

  // ------------------------------------------------ CCITT G4 (r16)

  private def bitsOf(data: Array[Byte]): String =
    data.flatMap(b => (7 to 0 by -1).map(i => ('0' + ((b >> i) & 1)).toChar))
      .mkString

  private def packBits(bits: String): Array[Byte] = {
    val out = new Array[Byte]((bits.length + 7) / 8)
    for (i <- bits.indices if bits.charAt(i) == '1')
      out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
    out
  }

  test("CcittG4 decode of a hand-assembled T.6 stream (codewords " +
       "transcribed from the public spec, independent of the encoder)") {
    import graft.sources.CcittG4
    // row 0: horizontal, white 3 ('1000') + black 4 ('011'); V0 closes
    // the row at column 10. row 1: identical → V0 V0 V0.
    val bits = "001" + "1000" + "011" + "1" + "111" +
      "000000000001000000000001"
    val out = CcittG4.decode(packBits(bits), 10, 2).get
    val row = Seq(false, false, false, true, true, true, true, false, false, false)
    assert(out.toSeq == row ++ row)
    // VR1/VL1: row 1 shifts the black run right by one
    val bits2 = "001" + "1000" + "011" + "1" + "011011" + "1" +
      "000000000001000000000001"
    val out2 = CcittG4.decode(packBits(bits2), 10, 2).get
    val row2 = Seq(false, false, false, false, true, true, true, true, false, false)
    assert(out2.toSeq == row ++ row2)
    // pass mode: ref row has a short black run the coding row skips —
    // row 1 = all white needs PASS over (3,7) then V0 at 10
    val bits3 = "001" + "1000" + "011" + "1" + "0001" + "1" +
      "000000000001000000000001"
    val out3 = CcittG4.decode(packBits(bits3), 10, 2).get
    assert(out3.toSeq == row ++ Seq.fill(10)(false))
  }

  test("CcittG4 encoder emits the spec bit patterns for known rows") {
    import graft.sources.CcittG4
    val row = Array(false, false, false, true, true, true, true, false,
      false, false)
    val enc = CcittG4.encode(row ++ row, 10, 2)
    assert(bitsOf(enc).startsWith("001" + "1000" + "011" + "1" + "111" +
      "000000000001000000000001"))
  }

  test("CcittG4 encode → decode round-trips exact pixels across shapes " +
       "(long runs exercise make-up codes; drift exercises all modes)") {
    import graft.sources.CcittG4
    val rnd = new scala.util.Random(4242)
    val shapes = Seq((64, 24), (1728, 4), (200, 31), (7, 7), (2600, 2))
    for ((w, h) <- shapes) {
      // structured: drifting stripes (vertical modes + pass)
      val stripes = Array.tabulate(w * h) { i =>
        val y = i / w; val x = i % w
        ((x + (y * 3) % 5) / math.max(3, w / 11)) % 2 == 1
      }
      assert(CcittG4.decode(CcittG4.encode(stripes, w, h), w, h)
        .get.toSeq == stripes.toSeq, s"stripes $w x $h")
      // random speckle (horizontal modes, short runs)
      val speckle = Array.fill(w * h)(rnd.nextInt(4) == 0)
      assert(CcittG4.decode(CcittG4.encode(speckle, w, h), w, h)
        .get.toSeq == speckle.toSeq, s"speckle $w x $h")
      // mostly-empty page with one long black band (make-up codes)
      val band = Array.tabulate(w * h)(i => (i / w) == h / 2)
      assert(CcittG4.decode(CcittG4.encode(band, w, h), w, h)
        .get.toSeq == band.toSeq, s"band $w x $h")
    }
  }

  test("CcittG4 decode never throws on junk or bit-flipped streams") {
    import graft.sources.CcittG4
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 200) {
      val junk = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      CcittG4.decode(junk, 1 + rnd.nextInt(100), 1 + rnd.nextInt(20))
    }
    val good = CcittG4.encode(Array.tabulate(32 * 8)(i => i % 5 == 0), 32, 8)
    for (_ <- 0 until 200) {
      val m = good.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      CcittG4.decode(m, 32, 8) // Option either way, no throw
    }
  }

  // ---------------------------- image-payload color spaces (r16)

  private def rawPdf(objects: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    for ((num, dict, stream) <- objects) {
      w(s"$num 0 obj\n$dict\n")
      stream.foreach { data => w("stream\n"); bos.write(data); w("\nendstream\n") }
      w("endobj\n")
    }
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  private def imagePdf(imgDict: String, imgBytes: Array[Byte],
                       extra: Seq[(Int, String, Option[Array[Byte]])] = Nil): Array[Byte] = {
    val content = "q 8 0 0 8 0 0 cm /Im1 Do Q"
    rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))),
      (5, s"$imgDict /Length ${imgBytes.length} >>", Some(imgBytes))) ++ extra)
  }

  private def onlyImage(pdf: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val Right(pages) = graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    pages.flatMap(_._2).headOption.map(b =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
  }

  test("Type 3 (glyph-procedure) fonts decode text through the same " +
       "/Differences + ToUnicode ladder as simple fonts") {
    // Type3 fonts carry no font program — their glyphs are content
    // streams — so text recovery rides /Encoding exactly like Type1;
    // a Subtype gate that skipped them would drop the page text
    val ISO = java.nio.charset.StandardCharsets.ISO_8859_1
    val content = "BT /F1 12 Tf (AB) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO))),
      (5, "<< /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10] " +
        "/FontMatrix [0.001 0 0 0.001 0 0] /CharProcs 6 0 R " +
        "/Encoding << /Differences [ 65 /X /quoteright ] >> >>", None),
      (6, "<< >>", None)))
    assert(graft.sources.MiniPdfDecoder().decode(pdf) ==
      Right(Seq("<div><p>X’</p></div>")))
  }

  test("Indexed palette over DeviceRGB expands EXACT per-pixel colors " +
       "(multi-color image, hex-string lookup)") {
    // 4x2, indices 0..3 then 3..0; palette = four distinct colors
    val pal = Seq((10, 20, 30), (200, 100, 50), (0, 255, 128), (255, 0, 9))
    val palHex = pal.map { case (r, g, b) => f"$r%02X$g%02X$b%02X" }.mkString
    val idx = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0)
    val pdf = imagePdf("<< /Subtype /Image /Width 4 /Height 2 " +
      s"/BitsPerComponent 8 /ColorSpace [/Indexed /DeviceRGB 3 <$palHex>]", idx)
    val img = onlyImage(pdf).get
    for (y <- 0 until 2; x <- 0 until 4) {
      val (r, g, b) = pal(idx(y * 4 + x) & 0xff)
      assert((img.getRGB(x, y) & 0xFFFFFF) == ((r << 16) | (g << 8) | b),
        s"pixel ($x,$y)")
    }
    // Indexed over an ICCBased N=3 base (nested array): the /ICCBased
    // token inside the base must NOT make the resolver treat the
    // stream as a direct 3-component raster — the samples are indices
    val icc = "icc".getBytes
    val pdf2 = imagePdf("<< /Subtype /Image /Width 4 /Height 2 " +
      s"/BitsPerComponent 8 /ColorSpace [/Indexed [/ICCBased 7 0 R] 3 <$palHex>]",
      idx, extra = Seq((7, s"<< /N 3 /Length ${icc.length} >>", Some(icc))))
    val img2 = onlyImage(pdf2).get
    for (y <- 0 until 2; x <- 0 until 4) {
      val (r, g, b) = pal(idx(y * 4 + x) & 0xff)
      assert((img2.getRGB(x, y) & 0xFFFFFF) == ((r << 16) | (g << 8) | b),
        s"ICC-based pixel ($x,$y)")
    }
  }

  test("ICCBased N=3 raster aliases DeviceRGB; N=1 aliases Gray; " +
       "N=4 converts as CMYK") {
    def px3(r: Int, g: Int, b: Int, n: Int) =
      Array.fill(n)(Seq(r.toByte, g.toByte, b.toByte)).flatten.toArray
    val icc = "icc".getBytes
    val p3 = imagePdf("<< /Subtype /Image /Width 2 /Height 2 " +
      "/BitsPerComponent 8 /ColorSpace [/ICCBased 7 0 R]", px3(9, 99, 199, 4),
      extra = Seq((7, s"<< /N 3 /Length ${icc.length} >>", Some(icc))))
    assert((onlyImage(p3).get.getRGB(1, 1) & 0xFFFFFF) == ((9 << 16) | (99 << 8) | 199))
    val p1 = imagePdf("<< /Subtype /Image /Width 2 /Height 2 " +
      "/BitsPerComponent 8 /ColorSpace [/ICCBased 7 0 R]",
      Array[Byte](0, 64, 127, 255.toByte),
      extra = Seq((7, s"<< /N 1 /Length ${icc.length} >>", Some(icc))))
    assert((onlyImage(p1).get.getRGB(1, 0) & 0xFFFFFF) == ((64 << 16) | (64 << 8) | 64))
    val p4 = imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/ICCBased 7 0 R]",
      Array[Byte](1, 2, 3, 4),
      extra = Seq((7, s"<< /N 4 /Length ${icc.length} >>", Some(icc))))
    assert((onlyImage(p4).get.getRGB(0, 0) & 0xFFFFFF) ==
      ((250 << 16) | (249 << 8) | 248),
      "ICC N=4 aliases DeviceCMYK (255 - c - k per channel)")
  }

  test("DeviceCMYK raster converts via the 8.6.4.4 additive clamp " +
       "(255 - min(255, ch + k)), including the overflow case") {
    // 2x1: pixel 0 moderate ink, pixel 1 overflows every channel sum
    val px = Array[Byte](10, 20, 30, 40,
      200.toByte, 220.toByte, 240.toByte, 100.toByte)
    val pdf = imagePdf("<< /Subtype /Image /Width 2 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceCMYK", px)
    val img = onlyImage(pdf).get
    assert((img.getRGB(0, 0) & 0xFFFFFF) ==
      ((205 << 16) | (195 << 8) | 185))
    assert((img.getRGB(1, 0) & 0xFFFFFF) == 0x000000,
      "c+k, m+k, y+k all exceed 255 -> clamps to black")
    // short sample data (3 comps for a 4-comp space) must drop
    val short = imagePdf("<< /Subtype /Image /Width 2 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceCMYK", px.take(7))
    assert(onlyImage(short).isEmpty)
    // 1-bpc CMYK is out of the re-wrap envelope -> drop, not guess
    val lowbpc = imagePdf("<< /Subtype /Image /Width 2 /Height 1 " +
      "/BitsPerComponent 1 /ColorSpace /DeviceCMYK", px)
    assert(onlyImage(lowbpc).isEmpty)
  }

  test("/SMask merges as the PNG alpha channel: exact per-pixel alpha, " +
       "inverted /Decode on the mask, dims-mismatch ships opaque") {
    // 3x2 RGB base, 8-bpc gray smask with distinct per-pixel values
    val base = Array[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90,
      100, 110, 120, 130.toByte, 140.toByte, 150.toByte, 160.toByte, 170.toByte, 180.toByte)
    val mask = Array[Byte](0, 64, 127, 128.toByte, 200.toByte, 255.toByte)
    val pdf = imagePdf("<< /Subtype /Image /Width 3 /Height 2 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceRGB /SMask 7 0 R",
      base, extra = Seq((7, "<< /Subtype /Image /Width 3 /Height 2 " +
        s"/BitsPerComponent 8 /ColorSpace /DeviceGray /Length ${mask.length} >>",
        Some(mask))))
    val img = onlyImage(pdf).get
    for (y <- 0 until 2; x <- 0 until 3) {
      val p = img.getRGB(x, y)
      assert((p >>> 24) == (mask(y * 3 + x) & 0xff), s"alpha ($x,$y)")
      assert(((p >> 16) & 0xFF) == (base(3 * (y * 3 + x)) & 0xff), s"red ($x,$y)")
    }
    // /Decode [1 0] on the MASK inverts alpha
    val inv = onlyImage(imagePdf("<< /Subtype /Image /Width 3 /Height 2 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceRGB /SMask 7 0 R",
      base, extra = Seq((7, "<< /Subtype /Image /Width 3 /Height 2 " +
        "/BitsPerComponent 8 /ColorSpace /DeviceGray /Decode [1 0] " +
        s"/Length ${mask.length} >>", Some(mask))))).get
    assert((inv.getRGB(0, 0) >>> 24) == 255)
    assert((inv.getRGB(2, 1) >>> 24) == 0)
    // dims mismatch: the transparency annotation drops, the base ships opaque
    val mism = onlyImage(imagePdf("<< /Subtype /Image /Width 3 /Height 2 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceRGB /SMask 7 0 R",
      base, extra = Seq((7, "<< /Subtype /Image /Width 2 /Height 2 " +
        s"/BitsPerComponent 8 /ColorSpace /DeviceGray /Length 4 >>",
        Some(Array[Byte](0, 0, 0, 0)))))).get
    assert((mism.getRGB(0, 0) >>> 24) == 255, "opaque on mismatch")
    assert((mism.getRGB(0, 0) & 0xFFFFFF) == ((10 << 16) | (20 << 8) | 30))
  }

  test("/Separation rasters: Type 2 tint over DeviceRGB (incl. N=2), " +
       "Type 0 sampled over gray with interpolation, Type 3 stitching, " +
       "CMYK alternate clamp, Type 4 range clamping") {
    def sepPdf(alt: String, fnObjs: Seq[(Int, String, Option[Array[Byte]])],
               sample: Int, extraImg: String = "") = imagePdf(
      "<< /Subtype /Image /Width 2 /Height 2 /BitsPerComponent 8 " +
        s"/ColorSpace [/Separation /Spot $alt 8 0 R] $extraImg",
      Array.fill(4)(sample.toByte), extra = fnObjs)
    // Type 2, N=1, RGB alternate: channel = floor(255 * t * C1 + 0.5)
    val t2 = Seq((8, "<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] " +
      "/C1 [0.5 0.25 1] /N 1 >>", None))
    val img = onlyImage(sepPdf("/DeviceRGB", t2, 128)).get
    val t = 128.0 / 255
    def b(v: Double) = math.floor(255 * v + 0.5).toInt
    assert((img.getRGB(0, 0) & 0xFFFFFF) ==
      ((b(t * 0.5) << 16) | (b(t * 0.25) << 8) | b(t * 1.0)))
    // N=2: quadratic tint
    val t2q = Seq((8, "<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] " +
      "/C1 [1 1 1] /N 2 >>", None))
    val q = onlyImage(sepPdf("/DeviceRGB", t2q, 128)).get
    assert(((q.getRGB(0, 0) >> 16) & 0xFF) == b(t * t))
    // Type 0 sampled over gray: 4 samples, e = 3t lands between 1 and 2
    val samples = Array[Byte](0, 100, 200.toByte, 250.toByte)
    val t0 = Seq((8, "<< /FunctionType 0 /Domain [0 1] /Range [0 1] " +
      s"/Size [4] /BitsPerSample 8 /Length 4 >>", Some(samples)))
    val g = onlyImage(sepPdf("/DeviceGray", t0, 128)).get
    val e = (128.0 / 255) * 3 / 1
    val raw = 100 + (e - 1) * (200 - 100)
    assert(((g.getRGB(0, 0) >> 8) & 0xFF) == b(raw / 255))
    // Type 3 stitching: t=0.75 → second piece, e=(t-0.5)/0.5
    val t3 = Seq(
      (8, "<< /FunctionType 3 /Domain [0 1] /Functions [9 0 R 10 0 R] " +
        "/Bounds [0.5] /Encode [0 1 0 1] >>", None),
      (9, "<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [0.5] /N 1 >>", None),
      (10, "<< /FunctionType 2 /Domain [0 1] /C0 [0.5] /C1 [1] /N 1 >>", None))
    val s3 = onlyImage(sepPdf("/DeviceGray", t3, 191)).get // t≈0.749
    val tt = 191.0 / 255
    val e3 = (tt - 0.5) * (1.0 - 0.0) / (1.0 - 0.5)
    assert((s3.getRGB(0, 0) & 0xFF) == b(0.5 + e3 * 0.5))
    // CMYK alternate rides the same additive clamp as DeviceCMYK
    val t2c = Seq((8, "<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0 0] " +
      "/C1 [1 0 0 1] /N 1 >>", None))
    val cm = onlyImage(sepPdf("/DeviceCMYK", t2c, 255)).get // full tint
    assert((cm.getRGB(0, 0) & 0xFFFFFF) == ((0 << 16) | (0 << 8) | 0))
    // Type 4 (PostScript calculator) evaluates: t-1 clamps to Range
    // floor 0 → black (full coverage in the dedicated Type 4 test)
    val t4 = Seq((8, "<< /FunctionType 4 /Domain [0 1] /Range [0 1] " +
      "/Length 10 >>", Some("{ 1 sub }".getBytes)))
    assert((onlyImage(sepPdf("/DeviceGray", t4, 100)).get
      .getRGB(0, 0) & 0xFFFFFF) == 0)
    // /Decode [1 0] inverts the tint
    val inv = onlyImage(sepPdf("/DeviceRGB", t2, 255, "/Decode [1 0] ")).get
    assert((inv.getRGB(0, 0) & 0xFFFFFF) == 0, "tint 0 -> C0 black")
    // a PRESENT-but-indirect /C0 must fail closed, not silently take
    // the spec default and fabricate colors (review regression)
    val indirect = Seq(
      (8, "<< /FunctionType 2 /Domain [0 1] /C0 9 0 R /C1 [1 1 1] /N 1 >>", None),
      (9, "<< >>", None))
    assert(onlyImage(sepPdf("/DeviceRGB", indirect, 128)).isEmpty)
    // same for a malformed /Encode on a sampled function
    val badEnc = Seq((8, "<< /FunctionType 0 /Domain [0 1] /Range [0 1] " +
      "/Size [4] /BitsPerSample 8 /Encode 9 0 R /Length 4 >>",
      Some(Array[Byte](0, 50, 100, (150).toByte))))
    assert(onlyImage(sepPdf("/DeviceGray", badEnc, 128)).isEmpty)
  }

  test("Type 4 PostScript tint functions: arithmetic, stack ops, " +
       "conditionals, degree trig; hostile programs fail closed") {
    def fnPdf(prog: String, alt: String, sample: Int,
              range: String = "[0 1]") = {
      val bytes = prog.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      imagePdf("<< /Subtype /Image /Width 2 /Height 2 /BitsPerComponent 8 " +
        s"/ColorSpace [/Separation /Ink $alt 8 0 R]",
        Array.fill(4)(sample.toByte),
        extra = Seq((8, s"<< /FunctionType 4 /Domain [0 1] /Range $range " +
          s"/Length ${bytes.length} >>", Some(bytes))))
    }
    def b(v: Double) = math.floor(255 * v + 0.5).toInt
    val t = 100.0 / 255
    // 1 - t (the classic ink→luminance inversion)
    val inv = onlyImage(fnPdf("{ 1 exch sub }", "/DeviceGray", 100)).get
    assert((inv.getRGB(0, 0) & 0xFF) == b(1 - t))
    // t^2 via dup mul
    assert((onlyImage(fnPdf("{ dup mul }", "/DeviceGray", 100)).get
      .getRGB(0, 0) & 0xFF) == b(t * t))
    // three outputs through dup/mul chains
    val rgb = onlyImage(fnPdf("{ dup 0.5 mul dup 0.5 mul }", "/DeviceRGB",
      100, range = "[0 1 0 1 0 1]")).get.getRGB(0, 0)
    assert(((rgb >> 16) & 0xFF) == b(t) && ((rgb >> 8) & 0xFF) == b(t * 0.5) &&
      (rgb & 0xFF) == b(t * 0.5 * 0.5))
    // conditional: threshold at 0.5
    def thresh(s: Int) = onlyImage(fnPdf(
      "{ 0.5 lt { 0 } { 1 } ifelse }", "/DeviceGray", s)).get.getRGB(0, 0) & 0xFF
    assert(thresh(100) == 0 && thresh(200) == 255)
    // degree trig: sin 90 = 1 exactly
    assert((onlyImage(fnPdf("{ 90 sin mul }", "/DeviceGray", 100)).get
      .getRGB(0, 0) & 0xFF) == b(t))
    // index copies a deep element
    val two = onlyImage(fnPdf("{ dup 1 index add }", "/DeviceGray", 100,
      range = "[0 1 0 2]"))
    assert(two.isEmpty, "2 outputs vs 1-component gray alternate must drop")
    // hostile: div-by-zero, unknown op, stack arity mismatch, unterminated
    for (bad <- Seq("{ 1 0 div }", "{ frobnicate }", "{ dup dup }", "{ 1 add"))
      assert(onlyImage(fnPdf(bad, "/DeviceGray", 100)).isEmpty, bad)
    // runaway nesting / op-budget: deep ifelse pyramid terminates to None
    val deep = "{ " + ("true { " * 60) + "1" + (" } { 0 } ifelse" * 60) + " }"
    onlyImage(fnPdf(deep, "/DeviceGray", 100)) // must return, not hang
    // brace bomb: 100k-deep nesting must fail the PARSE, not blow the
    // JVM stack (StackOverflowError would sail past catch Exception)
    val bomb = "{ " + ("{ " * 100000) + ("} " * 100000) + "}"
    assert(onlyImage(fnPdf(bomb, "/DeviceGray", 100)).isEmpty)
    // token-soup fuzz: random programs never throw or hang
    val r = new scala.util.Random(16)
    val words = Array("dup", "mul", "add", "exch", "roll", "index", "copy",
      "{", "}", "if", "ifelse", "0.5", "3", "-2", "true", "atan", "div",
      "bitshift", "not", "sqrt", "ln", "cvi", "pop")
    for (_ <- 0 until 300) {
      val prog = "{ " + Seq.fill(1 + r.nextInt(25))(
        words(r.nextInt(words.length))).mkString(" ") + " }"
      graft.sources.PsCalc.parse(prog).foreach(
        graft.sources.PsCalc.run(_, Array(0.4), 1)) // Option either way
    }
  }

  test("/DeviceN rasters: multi-input Type 4 tints with per-pixel ink " +
       "tuples; non-Type-4 and wrong-arity Domains fail closed") {
    def dnPdf(names: String, alt: String, prog: String, domain: String,
              range: String, px: Array[Byte], w: Int, h: Int,
              ftype: Int = 4) = {
      val bytes = prog.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      imagePdf(s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 8 " +
        s"/ColorSpace [/DeviceN [$names] $alt 8 0 R]", px,
        extra = Seq((8, s"<< /FunctionType $ftype /Domain $domain " +
          s"/Range $range /Length ${bytes.length} >>", Some(bytes))))
    }
    def b(v: Double) = math.floor(255 * v + 0.5).toInt
    // 2x1, DISTINCT per-pixel ink pairs: avg-invert over gray
    val px = Array[Byte](51, 102, 204.toByte, 255.toByte)
    val img = onlyImage(dnPdf("/Cyan /Magenta", "/DeviceGray",
      "{ add 0.5 mul 1 exch sub }", "[0 1 0 1]", "[0 1]", px, 2, 1)).get
    def avgInv(a: Int, c: Int) = b(1 - (a / 255.0 + c / 255.0) * 0.5)
    assert((img.getRGB(0, 0) & 0xFF) == avgInv(51, 102))
    assert((img.getRGB(1, 0) & 0xFF) == avgInv(204, 255))
    // input ORDER: first ink deepest — exch dup gives (t2, t1, t1)
    val rgbImg = onlyImage(dnPdf("/A /B", "/DeviceRGB",
      "{ exch dup }", "[0 1 0 1]", "[0 1 0 1 0 1]",
      Array[Byte](100, 200.toByte), 1, 1)).get
    val p = rgbImg.getRGB(0, 0)
    assert(((p >> 16) & 0xFF) == b(200 / 255.0) &&
      ((p >> 8) & 0xFF) == b(100 / 255.0) && (p & 0xFF) == b(100 / 255.0))
    // a Type 2 tint cannot take 2 inputs -> drop
    assert(onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/DeviceN [/A /B] /DeviceGray 8 0 R]",
      Array[Byte](10, 20),
      extra = Seq((8, "<< /FunctionType 2 /Domain [0 1 0 1] /C0 [0] " +
        "/C1 [1] /N 1 >>", None)))).isEmpty)
    // Domain arity must be 2m
    assert(onlyImage(dnPdf("/A /B", "/DeviceGray", "{ add }", "[0 1]",
      "[0 1]", Array[Byte](10, 20), 1, 1)).isEmpty)
    // short sample data (1 ink byte for a 2-ink pixel) -> drop
    assert(onlyImage(dnPdf("/A /B", "/DeviceGray", "{ add 0.5 mul }",
      "[0 1 0 1]", "[0 1]", Array[Byte](10), 1, 1)).isEmpty)
  }

  test("DeviceN over a multi-input SAMPLED (Type 0) tint: exact " +
       "bilinear interpolation, first-dimension-fastest sample layout") {
    // 2x2 LUT over two inks, gray output: corners c00=0, c10=100,
    // c01=200, c11=250 (flat order: (0,0),(1,0),(0,1),(1,1))
    val lut = Array[Byte](0, 100, 200.toByte, 250.toByte)
    def dn(sample1: Int, sample2: Int) = {
      val pdf = imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
        "/BitsPerComponent 8 /ColorSpace [/DeviceN [/A /B] /DeviceGray 8 0 R]",
        Array(sample1.toByte, sample2.toByte),
        extra = Seq((8, "<< /FunctionType 0 /Domain [0 1 0 1] /Range [0 1] " +
          s"/Size [2 2] /BitsPerSample 8 /Length 4 >>", Some(lut))))
      onlyImage(pdf).map(_.getRGB(0, 0) & 0xFF)
    }
    def expect(s1: Int, s2: Int): Int = {
      val (f1, f2) = (s1 / 255.0, s2 / 255.0)
      val raw = (1 - f1) * (1 - f2) * 0 + f1 * (1 - f2) * 100 +
        (1 - f1) * f2 * 200 + f1 * f2 * 250
      math.floor(255 * (raw / 255.0) + 0.5).toInt
    }
    // corners exact, midpoints bilinear
    assert(dn(0, 0).contains(0) && dn(255, 0).contains(100) &&
      dn(0, 255).contains(200) && dn(255, 255).contains(250))
    for ((a, b) <- Seq((128, 64), (51, 204), (17, 230)))
      assert(dn(a, b).contains(expect(a, b)), s"($a,$b)")
    // wrong /Size arity for the ink count drops
    val bad = imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/DeviceN [/A /B] /DeviceGray 8 0 R]",
      Array[Byte](1, 2),
      extra = Seq((8, "<< /FunctionType 0 /Domain [0 1 0 1] /Range [0 1] " +
        s"/Size [4] /BitsPerSample 8 /Length 4 >>", Some(lut))))
    assert(onlyImage(bad).isEmpty)
  }

  test("general /Decode arrays on raster legs: per-component ranges " +
       "interpolate, wrong arity fails closed (no silent defaults)") {
    def b(v: Double) = math.floor(255 * math.max(0.0, math.min(1.0, v)) + 0.5).toInt
    // RGB with a 6-entry decode: red inverted, green compressed to
    // [0.2, 0.6], blue identity
    val rgbPx = Array[Byte](255.toByte, 128.toByte, 64)
    val rgb = onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceRGB " +
      "/Decode [1 0 0.2 0.6 0 1]", rgbPx)).get.getRGB(0, 0)
    assert(((rgb >> 16) & 0xFF) == b(1 - 1.0))
    assert(((rgb >> 8) & 0xFF) == b(0.2 + (128 / 255.0) * 0.4))
    assert((rgb & 0xFF) == b(64 / 255.0))
    // gray partial range [0.25 0.75]
    val g = onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceGray /Decode [0.25 0.75]",
      Array[Byte](102))).get
    assert((g.getRGB(0, 0) & 0xFF) == b(0.25 + (102 / 255.0) * 0.5))
    // CMYK decode inverts the K channel before the additive clamp
    val cm = onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceCMYK " +
      "/Decode [0 1 0 1 0 1 1 0]",
      Array[Byte](10, 20, 30, 255.toByte))).get.getRGB(0, 0)
    assert(((cm >> 16) & 0xFF) == 255 - math.min(255, 10 + 0),
      "k=255 decodes to 0 under [1 0]")
    // wrong arity (4 entries on RGB) and indirect /Decode fail closed
    assert(onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceRGB /Decode [0 1 0 1]",
      rgbPx)).isEmpty)
    assert(onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceRGB /Decode 9 0 R",
      rgbPx)).isEmpty)
    // Indexed: non-default index decode drops rather than mis-indexing
    assert(onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/Indexed /DeviceRGB 1 <FF000000FF00>] " +
      "/Decode [0 1]", Array[Byte](0))).isEmpty)
    // ...while the explicit DEFAULT index decode passes through
    val idx = onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/Indexed /DeviceRGB 1 <FF000000FF00>] " +
      "/Decode [0 255]", Array[Byte](1))).get
    assert((idx.getRGB(0, 0) & 0xFFFFFF) == 0x00FF00)
    // Separation: a [0.5 1] decode compresses the tint range
    val sep = onlyImage(imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/Separation /Ink /DeviceGray 8 0 R] " +
      "/Decode [0.5 1]", Array[Byte](0),
      extra = Seq((8, "<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [1] " +
        "/N 1 >>", None)))).get
    assert((sep.getRGB(0, 0) & 0xFF) == b(0.5), "sample 0 -> tint 0.5")
  }

  test("Indexed guards: out-of-hival index and short palette drop the payload") {
    val palHex = "FF0000" + "00FF00" // hival 1, two entries
    val bad = imagePdf("<< /Subtype /Image /Width 2 /Height 1 " +
      s"/BitsPerComponent 8 /ColorSpace [/Indexed /DeviceRGB 1 <$palHex>]",
      Array[Byte](0, 3)) // index 3 > hival
    assert(onlyImage(bad).isEmpty)
    val short = imagePdf("<< /Subtype /Image /Width 1 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace [/Indexed /DeviceRGB 3 <FF0000>]",
      Array[Byte](0)) // palette shorter than 3*(hival+1)
    assert(onlyImage(short).isEmpty)
  }

  test("CCITT payload e2e: G4 XObject decodes to the planted bilevel PNG; " +
       "K>=0 (G3) and BlackIs1 sense are honoured") {
    import graft.sources.CcittG4
    val w = 16; val h = 4
    val bmp = Array.tabulate(w * h)(i => (i % w) >= 12) // right quarter black
    val g4 = CcittG4.encode(bmp, w, h)
    def dict(k: Int, b1: Boolean) =
      s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 1 " +
        "/ColorSpace /DeviceGray /Filter /CCITTFaxDecode " +
        s"/DecodeParms << /K $k /Columns $w /Rows $h /BlackIs1 $b1 >>"
    val img = onlyImage(imagePdf(dict(-1, b1 = false), g4)).get
    assert(img.getWidth == w && img.getHeight == h)
    assert((img.getRGB(0, 0) & 0xFFFFFF) == 0xFFFFFF, "white background")
    assert((img.getRGB(13, 2) & 0xFFFFFF) == 0x000000, "black run")
    val inv = onlyImage(imagePdf(dict(-1, b1 = true), g4)).get
    assert((inv.getRGB(0, 0) & 0xFFFFFF) == 0x000000,
      "BlackIs1: background renders dark (sample 0)")
    assert((inv.getRGB(13, 2) & 0xFFFFFF) == 0xFFFFFF)
    assert(onlyImage(imagePdf(dict(0, b1 = false), g4)).isEmpty,
      "a G4 stream under a K=0 dict must not decode as MH")
  }

  // ------------------------------------------------ CCITT G3 (r16)

  test("CcittG3 decode of hand-assembled streams: pure MH rows (K=0, no " +
       "EOLs) and K>0 EOL+tag rows (codewords from the public tables)") {
    import graft.sources.CcittG4
    // width 10: white 3 ('1000') + black 4 ('011') + white 3 ('1000')
    val mhRow = "1000" + "011" + "1000"
    val row = Seq(false, false, false, true, true, true, true, false, false, false)
    val k0 = CcittG4.decodeG3(packBits(mhRow * 3), 10, 3, 0).get
    assert(k0.toSeq == row ++ row ++ row)
    // K>0: EOL + tag(1=1D) announces each row
    val tagged = ("000000000001" + "1" + mhRow) * 2
    val kp = CcittG4.decodeG3(packBits(tagged), 10, 2, 4).get
    assert(kp.toSeq == row ++ row)
    // K>0 with a 2D row: EOL + tag(0) then V0 V0 V0 replays the line
    val mixed = "000000000001" + "1" + mhRow +
      "000000000001" + "0" + "111"
    val km = CcittG4.decodeG3(packBits(mixed), 10, 2, 4).get
    assert(km.toSeq == row ++ row)
    // a black-FIRST row needs the zero-length white run ('00110101')
    val blackFirst = "00110101" + "011" + "000111" // white0 black4 white1... width 5
    val kb = CcittG4.decodeG3(packBits(blackFirst), 5, 1, 0).get
    assert(kb.toSeq == Seq(true, true, true, true, false))
  }

  test("CcittG3 encode → decode round-trips exact pixels (K=0 and K=4, " +
       "long runs exercise make-up codes)") {
    import graft.sources.CcittG4
    val rnd = new scala.util.Random(1717)
    for ((w, h) <- Seq((64, 12), (1728, 3), (33, 9), (2600, 2))) {
      val stripes = Array.tabulate(w * h) { i =>
        val y = i / w; val x = i % w
        ((x + (y * 2) % 3) / math.max(2, w / 13)) % 2 == 1
      }
      val speckle = Array.fill(w * h)(rnd.nextInt(5) == 0)
      for (bmp <- Seq(stripes, speckle); k <- Seq(0, 4)) {
        assert(CcittG4.decodeG3(CcittG4.encodeG3(bmp, w, h, k), w, h, k)
          .get.toSeq == bmp.toSeq, s"$w x $h K=$k")
      }
    }
    // junk/bit-flip robustness
    for (_ <- 0 until 100) {
      val junk = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      CcittG4.decodeG3(junk, 1 + rnd.nextInt(64), 1 + rnd.nextInt(8), rnd.nextInt(5))
    }
  }

  test("G3 payload e2e: K=0 and K=4 XObjects decode; /Decode [1 0] " +
       "inverts CCITT and raster samples") {
    import graft.sources.CcittG4
    val w = 12; val h = 3
    val bmp = Array.tabulate(w * h)(i => (i % w) < 4) // left third black
    def dict(k: Int, dec: String) =
      s"<< /Subtype /Image /Width $w /Height $h /BitsPerComponent 1 " +
        s"/ColorSpace /DeviceGray $dec/Filter /CCITTFaxDecode " +
        s"/DecodeParms << /K $k /Columns $w /Rows $h >>"
    for (k <- Seq(0, 4)) {
      val img = onlyImage(imagePdf(dict(k, ""), CcittG4.encodeG3(bmp, w, h, k))).get
      assert((img.getRGB(1, 1) & 0xFFFFFF) == 0x000000 &&
        (img.getRGB(8, 1) & 0xFFFFFF) == 0xFFFFFF, s"K=$k")
    }
    val inv = onlyImage(imagePdf(dict(0, "/Decode [1 0] "),
      CcittG4.encodeG3(bmp, w, h, 0))).get
    assert((inv.getRGB(1, 1) & 0xFFFFFF) == 0xFFFFFF &&
      (inv.getRGB(8, 1) & 0xFFFFFF) == 0x000000, "/Decode [1 0] inverts")
    // 8-bpc gray raster with /Decode [1 0]
    val gray = imagePdf("<< /Subtype /Image /Width 2 /Height 1 " +
      "/BitsPerComponent 8 /ColorSpace /DeviceGray /Decode [1 0]",
      Array[Byte](0, 200.toByte))
    val g = onlyImage(gray).get
    assert((g.getRGB(0, 0) & 0xFF) == 255 && (g.getRGB(1, 0) & 0xFF) == 55)
  }

  test("inline BI..EI images: CCITT G4 fragments and low-bpc gray masks " +
       "ride the same container policy as XObjects (r16)") {
    import graft.sources.CcittG4
    val ISO = java.nio.charset.StandardCharsets.ISO_8859_1
    def inlinePdf(content: Array[Byte]): Array[Byte] = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content))))
    def firstImage(pdf: Array[Byte]) = {
      val Right(pages) = graft.sources.MiniPdfDecoder().decodeWithImages(pdf): @unchecked
      pages.flatMap(_._2).headOption.map(b =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    }
    // inline G4: 8x2, right half black
    val bmp = Array.tabulate(16)(i => (i % 8) >= 4)
    val g4 = CcittG4.encode(bmp, 8, 2)
    val c1 = ("BI /W 8 /H 2 /BPC 1 /CS /G /F /CCF " +
      "/DecodeParms << /K -1 /Columns 8 /Rows 2 >> ID ").getBytes(ISO) ++
      g4 ++ " EI".getBytes(ISO)
    val i1 = firstImage(inlinePdf(c1)).get
    assert(i1.getWidth == 8 && (i1.getRGB(1, 0) & 0xFFFFFF) == 0xFFFFFF &&
      (i1.getRGB(6, 1) & 0xFFFFFF) == 0x000000)
    // inline 1-bpc gray mask: width 10 (padded rows), left 2 cols ON
    val packed = Array[Byte](0xC0.toByte, 0x00, 0xC0.toByte, 0x00) // '11000000 00…' ×2
    val c2 = ("BI /W 10 /H 2 /BPC 1 /CS /G ID ").getBytes(ISO) ++
      packed ++ " EI".getBytes(ISO)
    val i2 = firstImage(inlinePdf(c2)).get
    assert((i2.getRGB(0, 0) & 0xFF) == 255 && (i2.getRGB(1, 1) & 0xFF) == 255 &&
      (i2.getRGB(2, 0) & 0xFF) == 0 && (i2.getRGB(9, 1) & 0xFF) == 0)
  }

  test("1/2/4-bpc rasters unpack high-bit-first with byte-padded rows " +
       "(exact pixels; a padding slip would shear rows)") {
    // 1-bpc, width 10 (rows pad to 2 bytes): left 3 columns ON
    val w1 = 10; val h1 = 3
    val bits1 = Array.tabulate(w1 * h1)(i => if (i % w1 < 3) 1 else 0)
    def pack(samples: Array[Int], w: Int, h: Int, bpc: Int): Array[Byte] = {
      val rowBytes = (w * bpc + 7) / 8
      val out = new Array[Byte](rowBytes * h)
      for (y <- 0 until h; x <- 0 until w) {
        val bitAt = x * bpc
        out(y * rowBytes + (bitAt >> 3)) =
          (out(y * rowBytes + (bitAt >> 3)) |
            ((samples(y * w + x) & ((1 << bpc) - 1)) <<
              (8 - bpc - (bitAt & 7)))).toByte
      }
      out
    }
    val p1 = imagePdf(s"<< /Subtype /Image /Width $w1 /Height $h1 " +
      "/BitsPerComponent 1 /ColorSpace /DeviceGray",
      pack(bits1, w1, h1, 1))
    val i1 = onlyImage(p1).get
    for (y <- 0 until h1; x <- 0 until w1)
      assert((i1.getRGB(x, y) & 0xFF) == (if (x < 3) 255 else 0), s"1bpc ($x,$y)")
    // 2-bpc gray ramp 0..3 → 0,85,170,255
    val p2 = imagePdf("<< /Subtype /Image /Width 4 /Height 1 " +
      "/BitsPerComponent 2 /ColorSpace /DeviceGray",
      pack(Array(0, 1, 2, 3), 4, 1, 2))
    val i2 = onlyImage(p2).get
    assert((0 until 4).map(x => i2.getRGB(x, 0) & 0xFF) == Seq(0, 85, 170, 255))
    // 4-bpc indexed, width 3 (odd → padded rows): palette lookup exact
    val pal = Seq((1, 2, 3), (250, 0, 9), (7, 200, 100))
    val palHex = pal.map { case (r, g, b) => f"$r%02X$g%02X$b%02X" }.mkString
    val p4 = imagePdf("<< /Subtype /Image /Width 3 /Height 2 " +
      s"/BitsPerComponent 4 /ColorSpace [/Indexed /DeviceRGB 2 <$palHex>]",
      pack(Array(0, 1, 2, 2, 1, 0), 3, 2, 4))
    val i4 = onlyImage(p4).get
    val expect = Seq(0, 1, 2, 2, 1, 0).map(pal)
    for (y <- 0 until 2; x <- 0 until 3) {
      val (r, g, b) = expect(y * 3 + x)
      assert((i4.getRGB(x, y) & 0xFFFFFF) == ((r << 16) | (g << 8) | b),
        s"4bpc ($x,$y)")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.sources.{MiniPdfDecoder, PdfCrypt}

/** Round-15 hardening specs: the r14 ADVICE items — SJIS-vs-1252
  * typographic punctuation, /CFM scoped to the /StmF-named crypt
  * filter, nested-form resource inheritance, PDF-name-syntax
  * /Differences tokenization, and the harmonic-centrality tier
  * signal. */
class Round15Spec extends AnyFunSuite {

  // --------------------------------------------------- charset heuristic

  test("undeclared-charset windows-1252 page with curly-quote contractions " +
       "is NOT misread as Shift_JIS") {
    // ’ is 0x92 in windows-1252; followed by an ASCII letter it forms a
    // byte-valid SJIS lead+trail pair — the false-positive class
    val text = "<html><body>don’t it’s we’re can’t " +
      "— plain latin prose</body></html>"
    val bytes = text.getBytes("windows-1252")
    assert(!graft.functions.Dom.isValidUtf8(bytes)) // heuristic path taken
    assert(graft.functions.Dom.detectEncoding(bytes).name == "windows-1252")
    assert(graft.functions.Dom.decodeHtml(bytes).contains("don’t"))
  }

  test("genuine Shift_JIS page still detects (strong pairs dominate)") {
    val text = "<html><body>こんにちは世界" +
      "、日本語のテキスト</body></html>"
    val bytes = text.getBytes("Shift_JIS")
    assert(graft.functions.Dom.detectEncoding(bytes).name == "Shift_JIS")
  }

  // ----------------------------------------- /CFM scoped to /StmF filter

  test("cryptFilterMode resolves the NAMED filter inside /CF, not the first " +
       "/CFM anywhere in the Encrypt dict") {
    val d = "<< /Filter /Standard /CF << /AcmeCF << /CFM /V2 /Length 16 >> " +
      "/StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF >>"
    assert(PdfCrypt.cryptFilterMode(d, "StdCF") == Some("AESV2"))
    assert(PdfCrypt.cryptFilterMode(d, "AcmeCF") == Some("V2"))
    assert(PdfCrypt.cryptFilterMode(d, "NoSuchCF").isEmpty)
    // CFM absent inside the named filter: None, never a bleed-through
    val noCfm = "<< /CF << /StdCF << /Length 16 >> >> /StmF /StdCF >>"
    assert(PdfCrypt.cryptFilterMode(noCfm, "StdCF").isEmpty)
  }

  test("decoy crypt filter listed BEFORE /StdCF in /CF: the AESV2 fixture " +
       "still decrypts (stream mode comes from the /StmF-named filter)") {
    val base = new String(
      EncryptedPdfFixtures.all.find(_.name == "aesv2").get.pdf, ISO_8859_1)
    val decoy = base.replace("/CF << /StdCF",
      "/CF << /AaCF << /CFM /V2 /Length 16 >> /StdCF")
    assert(decoy != base, "fixture shape changed — update the replace")
    assert(MiniPdfDecoder().decode(decoy.getBytes(ISO_8859_1)) ==
      Right(Seq(s"<div><p>${EncryptedPdfFixtures.all.find(_.name == "aesv2").get.text}</p></div>")))
  }

  test("/StmF-named filter with an ABSENT /CFM fails CLOSED") {
    val base = new String(
      EncryptedPdfFixtures.all.find(_.name == "aesv2").get.pdf, ISO_8859_1)
    val broken = base.replace("/CFM /AESV2", "/CFX /AESV2")
    assert(broken != base, "fixture shape changed — update the replace")
    val res = MiniPdfDecoder().decode(broken.getBytes(ISO_8859_1))
    assert(res.isLeft && res.swap.toOption.get.contains("encrypted"))
  }

  // ------------------------------------------------ PDF fixture assembly

  private def rawPdf(objects: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    for ((num, dict, stream) <- objects) {
      w(s"$num 0 obj\n$dict\n")
      stream.foreach { data => w("stream\n"); bos.write(data); w("\nendstream\n") }
      w("endobj\n")
    }
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  // ------------------------------------- nested-form resource inheritance

  test("form without /Resources invoked from a NESTED form sees the invoking " +
       "form's resources, not the page's (ISO 32000-1 §7.8.3)") {
    // page -> /FmOuter (own resources: /FmInner + /ImX) -> /FmInner
    // (NO resources) paints /ImX — resolvable only through the OUTER
    // form's map; the page's XObject map has no /ImX
    val pageContent = "BT (page) Tj ET /FmOuter Do"
    val outer = "BT (outer) Tj ET /FmInner Do"
    val inner = "BT (inner) Tj ET /ImX Do"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /FmOuter 5 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Form /Resources << /XObject << /FmInner 6 0 R " +
        s"/ImX 7 0 R >> >> /Length ${outer.length} >>", Some(outer.getBytes(ISO_8859_1))),
      (6, s"<< /Subtype /Form /Length ${inner.length} >>", Some(inner.getBytes(ISO_8859_1))),
      (7, "<< /Subtype /Image /Width 33 /Height 44 /Length 1 >>", Some(Array[Byte](0)))))
    assert(MiniPdfDecoder().decode(pdf) == Right(Seq(
      "<div><p>page outer inner</p>" +
        "<img width=\"33\" height=\"44\" src=\"img0.png\" alt=\"\"/></div>")))
  }

  test("nested form drawings inherit the invoker's XObject map the same way") {
    val pageContent = "/FmOuter Do"
    val outer = "/FmInner Do"
    val inner = "0 0 m 4 4 l S /FmLeaf Do"
    val leaf = "1 0 m 2 0 l S"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /FmOuter 5 0 R >> >> >>", None),
      (4, s"<< /Length ${pageContent.length} >>", Some(pageContent.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Form /Resources << /XObject << /FmInner 6 0 R " +
        s"/FmLeaf 7 0 R >> >> /Length ${outer.length} >>", Some(outer.getBytes(ISO_8859_1))),
      // inner has NO resources: /FmLeaf resolves through the OUTER map
      (6, s"<< /Subtype /Form /Length ${inner.length} >>", Some(inner.getBytes(ISO_8859_1))),
      (7, s"<< /Subtype /Form /Length ${leaf.length} >>", Some(leaf.getBytes(ISO_8859_1)))))
    val Right(pairs) = MiniPdfDecoder().decodeWithDrawings(pdf): @unchecked
    val svg = pairs.head._2
    assert(svg.contains("M 0 0 L 4 4"))
    assert(svg.contains("M 1 0 L 2 0"), "leaf form painted through inherited map")
  }

  // ------------------------------------ /Differences name-syntax tokens

  test("/Differences glyph name with an underscore-digit suffix never resets " +
       "the code counter (PDF name syntax tokenization)") {
    // broken tokenizer read /g_1 as name /g + integer 1, remapping the
    // NEXT name to code 1 instead of 66
    val content = "BT /F1 12 Tf (AB) Tj ET"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Type /Font /Subtype /Type1 /BaseFont /Foo " +
        "/Encoding << /Differences [ 65 /g_1 /quoteright ] >> >>", None)))
    // 65 → /g_1 (unmappable: byte-identity 'A'), 66 → /quoteright
    assert(MiniPdfDecoder().decode(pdf) ==
      Right(Seq("<div><p>A’</p></div>")))
  }

  // ----------------------------------------- harmonic tier is surfaced

  test("harmonicCentrality3 surfaces the tier it ran: exact vs capped") {
    val spark = TestSpark.spark
    import spark.implicits._
    val und = (1 to 10).map(i => (0L, i.toLong)).toDF("u", "v")
    graft.operators.Graph.harmonicCentrality3(und, topN = 5).collect()
    assert(graft.operators.Graph.lastHarmonicTier == "exact")
    graft.operators.Graph.harmonicCentrality3(und, hubCap = 4,
      exactWedgeCap = 0L, topN = 5).collect()
    assert(graft.operators.Graph.lastHarmonicTier == "capped")
  }

  // --------------------------------------------- real-pixel average pHash

  /** 8×8 black/white PNG from a 64-bit cell pattern (bit i bright),
    * optionally scaled up by an integer factor (block-average identity
    * check). */
  private def patternPng(bits: Long, scale: Int = 1): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8 * scale, 8 * scale,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (i <- 0 until 64; dy <- 0 until scale; dx <- 0 until scale)
      img.setRGB((i % 8) * scale + dx, (i / 8) * scale + dy,
        if (((bits >> i) & 1) == 1) 0xFFFFFF else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("averagePHash64 recovers the planted cell pattern from real pixels") {
    import graft.operators.Multimodal.JdkImageCodec.averagePHash64
    // half-bright pattern: mean interior, hash == pattern exactly
    val bits = 0x0F0F0F0F0F0F0F0FL
    assert(averagePHash64(patternPng(bits)) == Some(bits))
    // near-identical: 3 flipped cells → Hamming exactly 3
    val flipped = bits ^ ((1L << 5) | (1L << 23) | (1L << 58))
    val h1 = averagePHash64(patternPng(bits)).get
    val h2 = averagePHash64(patternPng(flipped)).get
    assert(java.lang.Long.bitCount(h1 ^ h2) == 3)
    // identical images → Hamming 0 (hash is deterministic)
    assert(averagePHash64(patternPng(flipped)).get == h2)
    // distinct patterns land far apart
    val other = 0x33CC33CC33CC33CCL
    assert(java.lang.Long.bitCount(
      h1 ^ averagePHash64(patternPng(other)).get) > 10)
  }

  test("averagePHash64 is scale-invariant under block-exact upsampling and " +
       "fails open on undecodable payloads") {
    import graft.operators.Multimodal.JdkImageCodec.averagePHash64
    val bits = 0x5A5A00FF5A5A00FFL
    val h8 = averagePHash64(patternPng(bits))
    assert(h8 == Some(bits))
    assert(averagePHash64(patternPng(bits, scale = 2)) == h8)
    assert(averagePHash64(patternPng(bits, scale = 5)) == h8)
    assert(averagePHash64("not an image".getBytes(ISO_8859_1)).isEmpty)
    assert(averagePHash64(Array.emptyByteArray).isEmpty)
  }

  // ------------------------------------------- in-PDF image payloads

  private def pdfWithImage(imgDict: String, imgBytes: Array[Byte],
                           w: Int, h: Int): Array[Byte] = {
    val content = "/Im1 Do"
    rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, s"<< /Subtype /Image /Width $w /Height $h $imgDict " +
        s"/Length ${imgBytes.length} >>", Some(imgBytes))))
  }

  test("planted JPEG XObject (/DCTDecode) surfaces verbatim and round-trips " +
       "dims + approximate luminance through the JDK codec") {
    val img = new java.awt.image.BufferedImage(20, 14,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(120, 80, 200)); g.fillRect(0, 0, 20, 14) }
    finally g.dispose()
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", jb)
    val pdf = pdfWithImage("/Filter /DCTDecode", jb.toByteArray, 20, 14)
    val Right(pages) = MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    val payloads = pages.flatMap(_._2)
    assert(payloads.length == 1)
    assert(java.util.Arrays.equals(payloads.head, jb.toByteArray),
      "DCT payload must surface verbatim")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payloads.head))
    assert(back.getWidth == 20 && back.getHeight == 14)
    val expLum = 0.299 * 120 + 0.587 * 80 + 0.114 * 200
    val lum = graft.operators.Multimodal.JdkImageCodec.meanLuminance(payloads.head)
    assert(math.abs(lum - expLum) < 3.0, s"JPEG luminance $lum vs $expLum")
  }

  test("raw Flate DeviceRGB raster re-wraps as lossless PNG with exact pixels") {
    val (w, h) = (6, 5)
    val px = Array.fill(w * h)(Array(10, 200, 33)).flatten.map(_.toByte)
    val d = new java.util.zip.Deflater(); d.setInput(px); d.finish()
    val buf = new Array[Byte](px.length + 64)
    val n = d.deflate(buf); d.end()
    val pdf = pdfWithImage(
      "/Filter /FlateDecode /ColorSpace /DeviceRGB /BitsPerComponent 8",
      buf.take(n), w, h)
    val Right(pages) = MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    val payloads = pages.flatMap(_._2)
    assert(payloads.length == 1)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payloads.head))
    assert(back.getWidth == w && back.getHeight == h)
    assert((back.getRGB(3, 2) & 0xFFFFFF) == ((10 << 16) | (200 << 8) | 33),
      "lossless pixel round-trip")
    // DeviceGray leg
    val gpx = Array.fill(w * h)(77.toByte)
    val d2 = new java.util.zip.Deflater(); d2.setInput(gpx); d2.finish()
    val gbuf = new Array[Byte](gpx.length + 64)
    val gn = d2.deflate(gbuf); d2.end()
    val gpdf = pdfWithImage(
      "/Filter /FlateDecode /ColorSpace /DeviceGray /BitsPerComponent 8",
      gbuf.take(gn), w, h)
    val Right(gp) = MiniPdfDecoder().decodeWithImages(gpdf): @unchecked
    val gback = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gp.flatMap(_._2).head))
    assert((gback.getRGB(0, 0) & 0xFFFFFF) == ((77 << 16) | (77 << 8) | 77))
  }

  test("inline BI..ID..EI image payloads surface through the same container policy") {
    // uncompressed 3x2 DeviceRGB inline image: 18 raw sample bytes
    val px = Array.fill(6)(Array(5, 250, 60)).flatten.map(_.toByte)
    val content = ("BT (t) Tj ET BI /W 3 /H 2 /CS /RGB /BPC 8 ID " +
      new String(px, ISO_8859_1) + " EI").getBytes(ISO_8859_1)
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content))))
    val Right(pages) = MiniPdfDecoder().decodeWithImages(pdf): @unchecked
    val payloads = pages.flatMap(_._2)
    assert(payloads.length == 1)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payloads.head))
    assert(back.getWidth == 3 && back.getHeight == 2)
    assert((back.getRGB(2, 1) & 0xFFFFFF) == ((5 << 16) | (250 << 8) | 60))
    // undersized inline data drops (never a torn PNG)
    val short = ("BI /W 9 /H 9 /CS /RGB /BPC 8 ID xy EI").getBytes(ISO_8859_1)
    val pdf2 = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
      (4, s"<< /Length ${short.length} >>", Some(short))))
    val Right(p2) = MiniPdfDecoder().decodeWithImages(pdf2): @unchecked
    assert(p2.flatMap(_._2).isEmpty)
    assert(p2.head._1.contains("<img width=\"9\""), "dims still reported")
  }

  test("unsupported/corrupt image payloads are dropped, never fabricated") {
    // truncated sample data: fewer bytes than w*h*ncomp
    val d = new java.util.zip.Deflater(); d.setInput(Array[Byte](1, 2, 3)); d.finish()
    val buf = new Array[Byte](64); val n = d.deflate(buf); d.end()
    val torn = pdfWithImage(
      "/Filter /FlateDecode /ColorSpace /DeviceRGB /BitsPerComponent 8",
      buf.take(n), 6, 5)
    val Right(p1) = MiniPdfDecoder().decodeWithImages(torn): @unchecked
    assert(p1.flatMap(_._2).isEmpty)
    // /DCTDecode whose bytes lack the JPEG SOI magic
    val junk = pdfWithImage("/Filter /DCTDecode", "notajpeg".getBytes(ISO_8859_1), 4, 4)
    val Right(p2) = MiniPdfDecoder().decodeWithImages(junk): @unchecked
    assert(p2.flatMap(_._2).isEmpty)
    // unsupported codec fails closed
    val jpx = pdfWithImage("/Filter /JPXDecode", Array[Byte](1, 2, 3, 4), 4, 4)
    val Right(p3) = MiniPdfDecoder().decodeWithImages(jpx): @unchecked
    assert(p3.flatMap(_._2).isEmpty)
    // the XHTML/text side is unaffected either way
    assert(p1.head._1.contains("<img"))
  }

  test("embedImages mode emits base64 data URIs that decode back (PyMuPDF " +
       "XHTML parity); default mode keeps filenames") {
    val px = Array.fill(4 * 3)(Array(9, 90, 180)).flatten.map(_.toByte)
    val d = new java.util.zip.Deflater(); d.setInput(px); d.finish()
    val buf = new Array[Byte](px.length + 64); val n = d.deflate(buf); d.end()
    val content = "/Im1 Do"
    val pdf = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Image /Width 4 /Height 3 /Filter /FlateDecode " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Length $n >>",
        Some(buf.take(n)))))
    val Right(plain) = MiniPdfDecoder().decode(pdf): @unchecked
    assert(plain.head.contains("src=\"img0.png\""))
    val Right(embedded) = MiniPdfDecoder(embedImages = true).decode(pdf): @unchecked
    val m = """src="data:image/png;base64,([A-Za-z0-9+/=]+)"""".r
      .findFirstMatchIn(embedded.head)
    assert(m.isDefined, embedded.head.take(200))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(m.get.group(1))))
    assert(back.getWidth == 4 && back.getHeight == 3)
    assert((back.getRGB(0, 0) & 0xFFFFFF) == ((9 << 16) | (90 << 8) | 180))
  }

  test("differencePHash64: gradient bits from real pixels, invariant under " +
       "monotone luminance transforms (brightness, gamma)") {
    import graft.operators.Multimodal.JdkImageCodec.differencePHash64
    // 9x8 image whose rows alternate an increasing / flat luminance
    // ramp, pushed through a monotone per-pixel transform
    def ramp(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val v = math.min(255, math.max(0,
          f(if (y % 2 == 0) 20 + x * 10 else 40)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val h0 = differencePHash64(ramp(identity)).get
    // even rows: strictly increasing → all 8 bits set; odd rows: flat → 0
    for (row <- 0 until 8; col <- 0 until 8)
      assert(((h0 >> (row * 8 + col)) & 1) == (if (row % 2 == 0) 1 else 0))
    // gradient DIRECTIONS survive any strictly monotone transform —
    // the re-encode/gamma-drift robustness a mean-threshold hash only
    // has for transforms that also preserve sides of the mean
    assert(differencePHash64(ramp(v => v + 60)).get == h0, "brightness shift")
    assert(differencePHash64(ramp(v => v * v / 255)).get == h0, "gamma curve")
    assert(differencePHash64(ramp(v => 255 - v)).get != h0,
      "inversion reverses gradients (sanity: the hash does look at pixels)")
    assert(differencePHash64("junk".getBytes).isEmpty)
  }

  test("Dedup.phashNearDups: star exact tier + distinct-hash band tier give " +
       "the same duplicate GROUPS as the brute-force all-pairs graph") {
    val spark = TestSpark.spark
    import spark.implicits._
    // hashes: 1,2 identical; 3 at hamming 2 from them; 4 far away;
    // 5,6 identical to each other, far from the rest
    val base = 0x0123456789ABCDEFL
    val df = Seq(
      (1L, base), (2L, base), (3L, base ^ ((1L << 5) | (1L << 40))),
      (4L, ~base), (5L, 0x00FF00FF00FF00FFL), (6L, 0x00FF00FF00FF00FFL))
      .toDF("doc_id", "phash")
    val out = graft.operators.Dedup.phashNearDups(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // r16 star-edge semantics: per identical-hash group one (min,
    // member) edge; per near hash pair ONE representative edge —
    // NOT the (2,3) clique edge the all-pairs listing would carry
    assert(out == Set((1L, 2L, 0L), (5L, 6L, 0L), (1L, 3L, 2L)))
    // connectivity contract: the star graph's connected components
    // equal the brute-force all-pairs graph's components
    val all = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib)).toSet
    def components(edges: Set[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      all.foreach { case (id, _) => find(id) }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      all.map { case (id, _) => find(id) }.toSet.map((r: Long) =>
        all.collect { case (id, _) if find(id) == r => id }.toSet)
    }
    assert(components(out.map(e => (e._1, e._2))) == components(brute))
    // the recall guarantee is only proven to hamming 3
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.phashNearDups(df, maxHamming = 4)
    }
  }

  // -------------------------------------------------- q364 AES-CBC leg

  test("q364 generator's RC4, AES-128 and AES-256/R6 legs all decode; " +
       "locked docs fail closed in every cipher class") {
    val spark = TestSpark.spark
    val out = SparkEntry.queries("q364_pdf_encrypted")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(out.nonEmpty)
    // all unlocked docs decode with the planted page count, whatever
    // the cipher class (0=RC4-128, 1=AESV2/128, 2=AESV3/256-R6)
    out.collect { case (id, (ok, np)) if id % 5 != 0 =>
      assert(ok == 1L && np == 1 + id % 3, s"cipher class ${id % 3} doc $id") }
    // locked docs fail closed regardless of cipher
    out.collect { case (id, (ok, _)) if id % 5 == 0 =>
      assert(ok == 0L, s"locked doc $id") }
    for (cls <- 0 to 2) {
      assert(out.keys.exists(id => id % 3 == cls && id % 5 != 0),
        s"cipher class $cls present")
      assert(out.keys.exists(id => id % 3 == cls && id % 5 == 0),
        s"locked class-$cls doc present")
    }
  }
}

package graft

/** Shared byte-level fixture-PDF builders for [[SparkEntry]]'s per-doc
  * decode queries (r17 — VERDICT r16 Next #3): q370/q371 and
  * q374–q383 each used to define an inline PDF-assembly UDF repeating
  * the same catalog/pages/page/content scaffolding (~80% shared
  * structure), and the resulting per-call-site lambda classes made
  * JIT/code-cache churn the driver bench's dominant noise source
  * (q17's 9× suite/solo delta on untouched code). One parameterized
  * builder lives here; each query's closure supplies only the image
  * dictionary + stream bytes. The emitted bytes are IDENTICAL to the
  * former inline builders — the tri-scale oracle hashes pin that
  * (verified against a pre-hoist Verify fingerprint dump at sf0.001).
  *
  * Everything here is FIXTURE-side (deterministic per doc_id, executor
  * friendly — no shared mutable state); the production decode path
  * under test is [[graft.sources.MiniPdf]] and friends.
  */
object PdfFixtures {

  private val ISO = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Flate-compress fixture samples (matches the inline builders:
    * single-shot deflate with a +64-byte slack buffer — fixture pixel
    * payloads are tiny and incompressible-free). */
  def flate(px: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(px); d.finish()
    val buf = new Array[Byte](px.length + 64)
    val n = d.deflate(buf); d.end(); buf.take(n)
  }

  /** Serialize numbered objects as a minimal PDF body (no xref — the
    * lenient object scanner in MiniPdf doesn't need one). */
  def rawPdf(objects: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def wr(str: String): Unit = bos.write(str.getBytes(ISO))
    wr("%PDF-1.5\n")
    for ((num, dict, stream) <- objects) {
      wr(s"$num 0 obj\n$dict\n")
      stream.foreach { st => wr("stream\n"); bos.write(st); wr("\nendstream\n") }
      wr("endobj\n")
    }
    wr("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  /** One-page PDF: fixed catalog/pages/page/content scaffolding
    * (objects 1–4, the content stream painting /Im1), then the
    * caller's objects (the image XObject as object 5, plus any
    * function/mask/ICC companions). */
  def onePage(content: String,
              extra: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] =
    rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO)))) ++
      extra)

  /** [[onePage]] with the standard `q S 0 0 S 0 0 cm /Im1 Do Q`
    * content stream. */
  def imagePage(scale: Int,
                extra: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] =
    onePage(s"q $scale 0 0 $scale 0 0 cm /Im1 Do Q", extra)

  /** Pack per-sample values into §8.9.3 rows: high bit first, rows
    * padded to byte boundaries. */
  def packSamples(samples: Array[Int], w: Int, h: Int, bpc: Int): Array[Byte] = {
    val rowBytes = (w * bpc + 7) / 8
    val out = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val bitAt = x * bpc
      val shift = 8 - bpc - (bitAt & 7)
      out(y * rowBytes + (bitAt >> 3)) =
        (out(y * rowBytes + (bitAt >> 3)) |
          ((samples(y * w + x) & ((1 << bpc) - 1)) << shift)).toByte
    }
    out
  }

  /** Pack a bit string ('0'/'1') MSB-first into bytes. */
  def packBits(bits: String): Array[Byte] = {
    val out = new Array[Byte]((bits.length + 7) / 8)
    for (i <- bits.indices if bits.charAt(i) == '1')
      out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
    out
  }

  // ------------------------------------------------ per-query builders
  // Each transcribes its former inline UDF body verbatim; the planted
  // arithmetic is mirrored by the query's DuckDB oracle SQL, so any
  // drift here breaks the tri-scale hash immediately.

  /** q370: even ids raw-Flate DeviceRGB (lossless PNG re-wrap), odd
    * ids a REAL JDK-encoded JPEG behind /DCTDecode. */
  def imagePayloadDoc(id: Long): Array[Byte] = {
    val (imgDict, imgBytes, w, h) =
      if (id % 2 == 0) {
        val w = 8 + (id % 16).toInt; val h = 8 + (id % 8).toInt
        val (r, g, b) = ((id % 256).toInt, ((id * 7) % 256).toInt,
          ((id * 13) % 256).toInt)
        val px = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
          i += 3
        }
        ("/Filter /FlateDecode /ColorSpace /DeviceRGB " +
          "/BitsPerComponent 8", flate(px), w, h)
      } else {
        val w = 16 + (id % 20).toInt; val h = 16 + (id % 12).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gr = img.createGraphics()
        try {
          gr.setColor(new java.awt.Color(((id * 31) % 256).toInt,
            ((id * 37) % 256).toInt, ((id * 41) % 256).toInt))
          gr.fillRect(0, 0, w, h)
        } finally gr.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpeg", bos)
        ("/Filter /DCTDecode /ColorSpace /DeviceRGB /BitsPerComponent 8",
          bos.toByteArray, w, h)
      }
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h $imgDict " +
        s"/Length ${imgBytes.length} >>", Some(imgBytes))))
  }

  /** q371: raw-Flate DeviceRGB XObject with planted dims/uniform color
    * behind a bare `/Im1 Do` content stream (the embedImages leg). */
  def dataUriDoc(id: Long): Array[Byte] = {
    val w = 8 + (id % 10).toInt; val h = 8 + (id % 6).toInt
    val (r, g, b) = (((id * 3) % 256).toInt, ((id * 11) % 256).toInt,
      ((id * 17) % 256).toInt)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
      i += 3
    }
    val fl = flate(px)
    onePage("/Im1 Do", Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h /Filter /FlateDecode " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Length ${fl.length} >>",
        Some(fl))))
  }

  /** q374: hand-coded ITU-T T.6 G4 stream — row 0 horizontal mode,
    * later rows vertical modes, EOFB; odd ids /BlackIs1 true. */
  def ccittG4Doc(id: Long): Array[Byte] = {
    val w = 24 + (id % 8).toInt; val h = 10 + (id % 5).toInt
    val p0 = 4 + (id % 4).toInt
    val len0 = 2 + ((id / 4) % 4).toInt
    val blackIs1 = id % 2 == 1
    // hand-transcribed ITU-T T.4 codewords (terminating codes only)
    val whiteCode = Map(4 -> "1011", 5 -> "1100", 6 -> "1110", 7 -> "1111")
    val blackCode = Map(2 -> "11", 3 -> "10", 4 -> "011", 5 -> "0011")
    def p(r: Int): Int = p0 + (if (r % 4 == 1 || r % 4 == 2) 1 else 0)
    val sb = new StringBuilder
    sb ++= "001" ++= whiteCode(p0) ++= blackCode(len0) ++= "1"
    for (r <- 1 until h) {
      val vc = (p(r) - p(r - 1)) match {
        case 1 => "011"; case -1 => "010"; case _ => "1"
      }
      sb ++= vc ++= vc ++= "1"
    }
    sb ++= "000000000001000000000001" // EOFB
    val g4 = packBits(sb.toString)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /CCITTFaxDecode /DecodeParms << /K -1 " +
        s"/Columns $w /Rows $h /BlackIs1 $blackIs1 >> " +
        s"/Length ${g4.length} >>", Some(g4))))
  }

  /** q375: three colorspace shapes — /Indexed over /DeviceRGB (hex
    * palette, raw samples), /Indexed over [/ICCBased N=3] (Flate),
    * direct [/ICCBased N=3] RGB behind Flate. */
  def colorspaceDoc(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt; val h = 6 + (id % 6).toInt
    val k0 = (id % 4).toInt
    def pal(k: Int): (Int, Int, Int) =
      (((id * (3 + k)) % 256).toInt, ((id * (7 + k)) % 256).toInt,
        ((id * (11 + k)) % 256).toInt)
    val palHex = (0 to 3).map { k =>
      val (r, g, b) = pal(k); f"$r%02X$g%02X$b%02X"
    }.mkString
    val (csDict, imgBytes, extraFilter) = (id % 3).toInt match {
      case 0 =>
        (s"/ColorSpace [/Indexed /DeviceRGB 3 <$palHex>]",
          Array.fill(w * h)(k0.toByte), "")
      case 1 =>
        (s"/ColorSpace [/Indexed [/ICCBased 7 0 R] 3 <$palHex>]",
          flate(Array.fill(w * h)(k0.toByte)), "/Filter /FlateDecode ")
      case _ =>
        val (r, g, b) = (((id * 5) % 256).toInt, ((id * 9) % 256).toInt,
          ((id * 13) % 256).toInt)
        val px = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
          i += 3
        }
        ("/ColorSpace [/ICCBased 7 0 R]", flate(px), "/Filter /FlateDecode ")
    }
    val icc = "fake-icc-profile-bytes".getBytes(ISO)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        s"/BitsPerComponent 8 $csDict $extraFilter" +
        s"/Length ${imgBytes.length} >>", Some(imgBytes)),
      (7, s"<< /N 3 /Length ${icc.length} >>", Some(icc))))
  }

  /** q376: G3 legs — even ids K=0 pure MH (no EOLs), odd ids K=4
    * mixed with EOL+tag per row; id%3==0 adds /Decode [1 0]. */
  def ccittG3Doc(id: Long): Array[Byte] = {
    val p0 = 4 + (id % 4).toInt
    val len0 = 2 + ((id / 4) % 4).toInt
    val rest = 8 + (id % 8).toInt
    val w = p0 + len0 + rest; val h = 6 + (id % 5).toInt
    val k = if (id % 2 == 0) 0 else 4
    val dec10 = id % 3 == 0
    val whiteCode = Map(4 -> "1011", 5 -> "1100", 6 -> "1110",
      7 -> "1111", 8 -> "10011", 9 -> "10100", 10 -> "00111",
      11 -> "01000", 12 -> "001000", 13 -> "000011", 14 -> "110100",
      15 -> "110101")
    val blackCode = Map(2 -> "11", 3 -> "10", 4 -> "011", 5 -> "0011")
    val rowBits = whiteCode(p0) + blackCode(len0) + whiteCode(rest)
    val bits = (if (k > 0) ("000000000001" + "1" + rowBits) * h
                else rowBits * h)
    val g3 = packBits(bits)
    val decodeKey = if (dec10) "/Decode [1 0] " else ""
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        s"/BitsPerComponent 1 /ColorSpace /DeviceGray $decodeKey" +
        "/Filter /CCITTFaxDecode /DecodeParms << " +
        s"/K $k /Columns $w /Rows $h >> " +
        s"/Length ${g3.length} >>", Some(g3))))
  }

  /** q377: 1/2/4-bpc rasters — 1-bpc split bitmap (/Decode [1 0] on
    * odd ids), 2-bpc uniform level, 4-bpc /Indexed 16-entry palette. */
  def lowBpcDoc(id: Long): Array[Byte] = {
    val w = 10 + (id % 7).toInt; val h = 5 + (id % 6).toInt
    val (csDict, bpc, samples, decodeKey) = (id % 3).toInt match {
      case 0 =>
        val xsplit = 1 + (id % (w - 1)).toInt
        (s"/ColorSpace /DeviceGray", 1,
          Array.tabulate(w * h)(i => if (i % w < xsplit) 1 else 0),
          if (id % 2 == 1) "/Decode [1 0] " else "")
      case 1 =>
        (s"/ColorSpace /DeviceGray", 2,
          Array.fill(w * h)((id % 4).toInt), "")
      case _ =>
        val palHex = (0 to 15).map { kk =>
          f"${((id * (3 + kk)) % 256).toInt}%02X" +
            f"${((id * (7 + kk)) % 256).toInt}%02X" +
            f"${((id * (11 + kk)) % 256).toInt}%02X"
        }.mkString
        (s"/ColorSpace [/Indexed /DeviceRGB 15 <$palHex>]", 4,
          Array.fill(w * h)((id % 16).toInt), "")
    }
    val imgBytes = flate(packSamples(samples, w, h, bpc))
    imagePage(8, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        s"/BitsPerComponent $bpc $csDict $decodeKey/Filter /FlateDecode " +
        s"/Length ${imgBytes.length} >>", Some(imgBytes))))
  }

  /** q378: uniform CMYK — even ids raw /DeviceCMYK, odd ids
    * [/ICCBased N=4] behind Flate; c+k overflows 255 on many ids so
    * the §8.6.4.4 clamp is load-bearing. */
  def cmykDoc(id: Long): Array[Byte] = {
    val w = 7 + (id % 9).toInt; val h = 5 + (id % 7).toInt
    val c = ((id * 3) % 256).toInt; val m = ((id * 7) % 256).toInt
    val y = ((id * 11) % 256).toInt; val k = ((id * 5) % 256).toInt
    val px = new Array[Byte](w * h * 4)
    var i = 0
    while (i < px.length) {
      px(i) = c.toByte; px(i + 1) = m.toByte
      px(i + 2) = y.toByte; px(i + 3) = k.toByte
      i += 4
    }
    val (csDict, imgBytes, extraFilter) =
      if (id % 2 == 0) ("/ColorSpace /DeviceCMYK", px, "")
      else ("/ColorSpace [/ICCBased 7 0 R]", flate(px),
        "/Filter /FlateDecode ")
    val icc = "fake-icc-profile-bytes".getBytes(ISO)
    imagePage(9, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        s"/BitsPerComponent 8 $csDict $extraFilter" +
        s"/Length ${imgBytes.length} >>", Some(imgBytes)),
      (7, s"<< /N 4 /Length ${icc.length} >>", Some(icc))))
  }

  /** q379: five JBIG2 region shapes painting identical geometry — MQ
    * t0, MQ t2+TPGDON, MMR, arithmetic symbol dict + text region,
    * transposed text region; odd ids add /Decode [1 0]. */
  def jbig2Doc(id: Long): Array[Byte] = {
    val w = 18 + (id % 8).toInt; val h = 8 + (id % 6).toInt
    val xsplit = 2 + (id % (w - 4)).toInt
    val px = Array.tabulate(w * h)(i => i % w >= xsplit) // right black
    val stream = (id % 5).toInt match {
      case 0 => graft.sources.Jbig2.encodeEmbedded(px, w, h)
      case 1 => graft.sources.Jbig2.encodeEmbedded(px, w, h,
        template = 2, tpgdon = true)
      case 2 => graft.sources.Jbig2.encodeEmbedded(px, w, h, mmr = true)
      case leg =>
        val black = w - xsplit
        val a = math.max(1, black / 2); val b = black - a
        val glyphs = Seq((a, h, Array.fill(a * h)(true))) ++
          (if (b > 0) Seq((b, h, Array.fill(b * h)(true))) else Nil)
        val places = Seq((0, xsplit, 0)) ++
          (if (b > 0) Seq((1, xsplit + a, 0)) else Nil)
        graft.sources.Jbig2.encodeEmbeddedText(glyphs, places, w, h,
          transposed = leg == 4)
    }
    val decodeKey = if (id % 2 == 1) "/Decode [1 0] " else ""
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        s"$decodeKey/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q380: /SMask shapes — RGB base + split gray mask, gray base +
    * uniform mask with the mask's own /Decode [1 0], no mask. */
  def smaskDoc(id: Long): Array[Byte] = {
    val w = 6 + (id % 6).toInt; val h = 4 + (id % 5).toInt
    val xs = 1 + (id % (w - 1)).toInt
    val (r, g, b) = (((id * 3) % 256).toInt, ((id * 7) % 256).toInt,
      ((id * 11) % 256).toInt)
    val a = 1 + ((id * 5) % 255).toInt
    val rgbPx = Array.tabulate(w * h * 3)(i =>
      (if (i % 3 == 0) r else if (i % 3 == 1) g else b).toByte)
    val grayPx = Array.fill(w * h)(g.toByte)
    val splitMask = Array.tabulate(w * h)(i =>
      (if (i % w < xs) 0 else a).toByte)
    val uniformMask = Array.fill(w * h)(a.toByte)
    val extra = (id % 3).toInt match {
      case 0 => Seq(
        (5, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace /DeviceRGB /SMask 7 0 R " +
          s"/Length ${rgbPx.length} >>", Some(rgbPx)),
        (7, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace /DeviceGray " +
          s"/Length ${splitMask.length} >>", Some(splitMask)))
      case 1 => Seq(
        (5, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace /DeviceGray /SMask 7 0 R " +
          s"/Length ${grayPx.length} >>", Some(grayPx)),
        (7, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace /DeviceGray /Decode [1 0] " +
          s"/Length ${uniformMask.length} >>", Some(uniformMask)))
      case _ => Seq(
        (5, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace /DeviceRGB " +
          s"/Length ${rgbPx.length} >>", Some(rgbPx)))
    }
    imagePage(9, extra)
  }

  /** q381: /Separation tints through the three 1-input function types
    * (Type 2 exponential, Type 0 sampled LUT, Type 3 stitching). */
  def separationDoc(id: Long): Array[Byte] = {
    val w = 5 + (id % 7).toInt; val h = 4 + (id % 5).toInt
    val sByte = ((id * 7) % 256).toInt // uniform tint sample
    def dec(k: Int): String = // exact decimal of k/256
      (BigDecimal(k) / 256).bigDecimal.stripTrailingZeros.toPlainString
    val (kr, kg, kb) = (((id * 3) % 257).toInt, ((id * 5) % 257).toInt,
      ((id * 11) % 257).toInt)
    val g0 = ((id * 13) % 256).toInt; val g1 = ((id * 17) % 256).toInt
    val g2 = ((id * 19) % 256).toInt; val g3 = ((id * 23) % 256).toInt
    val (ka, kb2, kc) = (((id * 29) % 257).toInt, ((id * 31) % 257).toInt,
      ((id * 37) % 257).toInt)
    val leg = (id % 3).toInt
    val px = Array.fill(w * h)(sByte.toByte)
    val alt = if (leg == 0) "/DeviceRGB" else "/DeviceGray"
    val img = (5, s"<< /Subtype /Image /Width $w /Height $h " +
      s"/BitsPerComponent 8 /ColorSpace [/Separation /Spot $alt 8 0 R] " +
      s"/Length ${px.length} >>", Some(px))
    val fns = leg match {
      case 0 => Seq(
        (8, "<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] " +
          s"/C1 [${dec(kr)} ${dec(kg)} ${dec(kb)}] /N 1 >>", None))
      case 1 =>
        val samples = Array(g0.toByte, g1.toByte, g2.toByte, g3.toByte)
        Seq((8, "<< /FunctionType 0 /Domain [0 1] /Range [0 1] " +
          "/Size [4] /BitsPerSample 8 /Length 4 >>", Some(samples)))
      case _ => Seq(
        (8, "<< /FunctionType 3 /Domain [0 1] " +
          "/Functions [9 0 R 10 0 R] /Bounds [0.5] /Encode [0 1 0 1] >>",
          None),
        (9, s"<< /FunctionType 2 /Domain [0 1] /C0 [0] " +
          s"/C1 [${dec(ka)}] /N 1 >>", None),
        (10, s"<< /FunctionType 2 /Domain [0 1] /C0 [${dec(kb2)}] " +
          s"/C1 [${dec(kc)}] /N 1 >>", None))
    }
    imagePage(9, img +: fns)
  }

  /** q382: Type 4 (PostScript calculator) tint transforms. */
  def type4Doc(id: Long): Array[Byte] = {
    val w = 5 + (id % 8).toInt; val h = 4 + (id % 6).toInt
    val sByte = ((id * 9) % 256).toInt
    val leg = (id % 3).toInt
    val (alt, range, prog) = leg match {
      case 0 => ("/DeviceGray", "[0 1]", "{ 1 exch sub }")
      case 1 => ("/DeviceGray", "[0 1]", "{ dup mul }")
      case _ => ("/DeviceRGB", "[0 1 0 1 0 1]",
        "{ dup 0.5 mul dup 0.5 mul }")
    }
    val progBytes = prog.getBytes(ISO)
    val px = Array.fill(w * h)(sByte.toByte)
    imagePage(9, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        s"/BitsPerComponent 8 /ColorSpace [/Separation /Ink $alt 8 0 R] " +
        s"/Length ${px.length} >>", Some(px)),
      (8, s"<< /FunctionType 4 /Domain [0 1] /Range $range " +
        s"/Length ${progBytes.length} >>", Some(progBytes))))
  }

  /** q383: /DeviceN two-ink rasters through multi-input Type 4. */
  def devicenDoc(id: Long): Array[Byte] = {
    val w = 5 + (id % 7).toInt; val h = 4 + (id % 5).toInt
    val s1 = ((id * 7) % 256).toInt; val s2 = ((id * 11) % 256).toInt
    val leg = (id % 2).toInt
    val (alt, range, prog) =
      if (leg == 0) ("/DeviceGray", "[0 1]", "{ add 0.5 mul 1 exch sub }")
      else ("/DeviceRGB", "[0 1 0 1 0 1]", "{ exch dup }")
    val progBytes = prog.getBytes(ISO)
    val px = new Array[Byte](w * h * 2)
    var i = 0
    while (i < px.length) { px(i) = s1.toByte; px(i + 1) = s2.toByte; i += 2 }
    imagePage(9, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 8 " +
        s"/ColorSpace [/DeviceN [/InkA /InkB] $alt 8 0 R] " +
        s"/Length ${px.length} >>", Some(px)),
      (8, s"<< /FunctionType 4 /Domain [0 1 0 1] /Range $range " +
        s"/Length ${progBytes.length} >>", Some(progBytes))))
  }

  /** q362: planted-dims PDF — one image XObject (+ an inline BI..ID..EI image on even ids). */
  def plantedDimsDoc(id: Long, n: Long): Array[Byte] = {

        val w1 = 100 + (id % 200).toInt; val h1 = 50 + (n % 150).toInt
        val wi = 10 + (id % 90).toInt; val hi = 20 + (id % 70).toInt
        val content = s"BT (doc body) Tj ET /Im1 Do" +
          (if (id % 2 == 0) s" BI /W $wi /H $hi /BPC 8 ID   EI" else "")
        val sb = new StringBuilder("%PDF-1.4\n")
        def obj(num: Int, dict: String, stream: Option[String]): Unit = {
          sb.append(s"$num 0 obj\n$dict\n")
          stream.foreach(st => sb.append(s"stream\n$st\nendstream\n"))
          sb.append("endobj\n")
        }
        obj(1, "<< /Type /Catalog /Pages 2 0 R >>", None)
        obj(2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None)
        obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
          "/Resources << /XObject << /Im1 5 0 R >> >> >>", None)
        obj(4, s"<< /Length ${content.length} >>", Some(content))
        obj(5, s"<< /Subtype /Image /Width $w1 /Height $h1 " +
          "/BitsPerComponent 8 /Length 1 >>", Some(" "))
        sb.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
        sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** q363: multi-page PDF with planted per-page word/image counts. */
  def channelsDoc(id: Long): Array[Byte] = {

        val pcount = 1 + (id % 3).toInt
        val sb = new StringBuilder("%PDF-1.4\n")
        def obj(num: Int, dict: String, stream: Option[String]): Unit = {
          sb.append(s"$num 0 obj\n$dict\n")
          stream.foreach(st => sb.append(s"stream\n$st\nendstream\n"))
          sb.append("endobj\n")
        }
        obj(1, "<< /Type /Catalog /Pages 2 0 R >>", None)
        val kids = (0 until pcount).map(p => s"${10 + p} 0 R").mkString(" ")
        obj(2, s"<< /Type /Pages /Kids [ $kids ] /Count $pcount >>", None)
        obj(5, "<< /Subtype /Image /Width 30 /Height 40 /Length 1 >>", Some(" "))
        for (p <- 0 until pcount) {
          val wc = 1 + ((id + p) % 8).toInt
          val m = ((id + p) % 3).toInt
          val words = Seq.fill(wc)("word").mkString(" ")
          val content = s"BT ($words) Tj ET" + " /Im1 Do" * m
          obj(10 + p, s"<< /Type /Page /Parent 2 0 R /Contents ${20 + p} 0 R " +
            "/Resources << /XObject << /Im1 5 0 R >> >> >>", None)
          obj(20 + p, s"<< /Length ${content.length} >>", Some(content))
        }
        sb.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
        sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** q364: encrypted PDF cycling RC4-40/RC4-128/AESV2/AES-256-R6 (+ locked docs) — the fixture derives keys independently of the production PdfCrypt. */
  def encryptedDoc(id: Long): Array[Byte] = {

        import java.security.MessageDigest
        val pad = Array( // ISO 32000-1 §7.6.3.3 padding constant (public)
          0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
          0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
          0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
          0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)
        def md5(parts: Array[Byte]*): Array[Byte] = {
          val d = MessageDigest.getInstance("MD5"); parts.foreach(d.update); d.digest()
        }
        def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
          val st = Array.tabulate(256)(_.toByte)
          var j = 0
          for (i <- 0 until 256) {
            j = (j + st(i) + key(i % key.length)) & 0xff
            val t = st(i); st(i) = st(j); st(j) = t
          }
          val out = new Array[Byte](data.length)
          var x = 0; var y = 0
          for (k <- data.indices) {
            x = (x + 1) & 0xff; y = (y + st(x)) & 0xff
            val t = st(x); st(x) = st(y); st(y) = t
            out(k) = (data(k) ^ st((st(x) + st(y)) & 0xff)).toByte
          }
          out
        }
        def le(v: Long, n: Int): Array[Byte] =
          Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)
        val locked = id % 5 == 0
        val pw: Array[Byte] = // padded user password (Algorithm 2 step a)
          if (locked) ("x".getBytes("ISO-8859-1") ++ pad).take(32) else pad
        // Algorithm 3: /O for an empty owner password
        var ok0 = md5(pad)
        for (_ <- 0 until 50) ok0 = md5(ok0.take(16))
        val okey = ok0.take(16)
        var o = rc4(okey, pad) // padded (empty) user password
        for (i <- 1 to 19) o = rc4(okey.map(b => (b ^ i).toByte), o)
        // Algorithm 2: 128-bit file key under the CONTENT password
        val id0 = md5(le(id, 8))
        val pPerm = -3904L
        var fk = md5(pw, o, le(pPerm & 0xffffffffL, 4), id0)
        for (_ <- 0 until 50) fk = md5(fk.take(16))
        val fileKey = fk.take(16)
        // Algorithm 5: /U from that key (locked docs embed a /U the
        // empty-password check cannot reproduce)
        var u = rc4(fileKey, md5(pad, id0))
        for (i <- 1 to 19) u = rc4(fileKey.map(b => (b ^ i).toByte), u)
        val u32 = u ++ new Array[Byte](16)
        val aes = id % 3 == 1 // V4/R4 /AESV2 leg
        val v5 = id % 3 == 2 // V5/R6 /AESV3 AES-256 leg (r16)
        // Algorithm 1 (RC4) / 1.A (AES: +sAlT suffix) object keys
        val sAlT = Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte)
        def objKey(num: Int): Array[Byte] =
          (if (aes) md5(fileKey, le(num.toLong, 3), le(0L, 2), sAlT)
           else md5(fileKey, le(num.toLong, 3), le(0L, 2))).take(16)
        // AES-CBC with the IV prepended (ISO 32000-1 §7.6.2); the
        // IV is derived deterministically so the fixture is stable
        def aesEnc(key: Array[Byte], num: Int, data: Array[Byte]): Array[Byte] = {
          val iv = md5(le(id, 8), le(num.toLong, 4)).take(16)
          val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
          c.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(key, "AES"),
            new javax.crypto.spec.IvParameterSpec(iv))
          iv ++ c.doFinal(data)
        }
        // ---- V5/R6 material (ISO 32000-2 §7.6.4, empty user password;
        // Algorithm 2.B implemented HERE from the spec, independent of
        // PdfCrypt's copy — plus the Python fixture generator as the
        // third implementation)
        def sha2(alg: String, parts: Array[Byte]*): Array[Byte] = {
          val d = MessageDigest.getInstance(alg); parts.foreach(d.update); d.digest()
        }
        def aesNoPad(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          c.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(key, "AES"),
            new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
          c.doFinal(data)
        }
        def hash2B(pw: Array[Byte], salt: Array[Byte],
                   udata: Array[Byte]): Array[Byte] = {
          var k = sha2("SHA-256", pw, salt, udata)
          var round = 0
          var done = false
          // getInstance hoisted out of the ≥64-round loop (the provider
          // lookup would otherwise dominate the KDF)
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          val digests = Array("SHA-256", "SHA-384", "SHA-512")
            .map(MessageDigest.getInstance)
          while (!done) {
            val block = pw ++ k ++ udata
            val k1 = Array.fill(64)(block).flatten
            c.init(javax.crypto.Cipher.ENCRYPT_MODE,
              new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
              new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
            val e = c.doFinal(k1)
            val d = digests(e.take(16).map(_ & 0xff).sum % 3)
            d.reset(); d.update(e); k = d.digest()
            round += 1
            if (round >= 64 && (e.last & 0xff) <= round - 32) done = true
          }
          k.take(32)
        }
        // deterministic 256-bit file key + salts; locked docs derive
        // BOTH password records from a real password ("x") so neither
        // the user nor the owner empty-password check can open them
        val fileKey32 = sha2("SHA-256", le(id, 8), "fk".getBytes("ISO-8859-1"))
        val v5Pw: Array[Byte] =
          if (locked) "x".getBytes("ISO-8859-1") else Array.emptyByteArray
        lazy val (u48, ue, o48, oe, perms) = {
          val vSalt = md5(le(id, 8), "vs".getBytes("ISO-8859-1")).take(8)
          val kSalt = md5(le(id, 8), "ks".getBytes("ISO-8859-1")).take(8)
          val u48v = hash2B(v5Pw, vSalt, Array.emptyByteArray) ++ vSalt ++ kSalt
          val uev = aesNoPad(hash2B(v5Pw, kSalt, Array.emptyByteArray), fileKey32)
          val oVSalt = md5(le(id, 8), "ovs".getBytes("ISO-8859-1")).take(8)
          val oKSalt = md5(le(id, 8), "oks".getBytes("ISO-8859-1")).take(8)
          val o48v = hash2B(v5Pw, oVSalt, u48v) ++ oVSalt ++ oKSalt
          val oev = aesNoPad(hash2B(v5Pw, oKSalt, u48v), fileKey32)
          // /Perms: AES-256-ECB(file key) over P ‖ FFFFFFFF ‖ 'T' ‖ 'adb' ‖ 4
          val pc = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
          pc.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(fileKey32, "AES"))
          val permsPlain = le(pPerm & 0xffffffffL, 4) ++
            Array.fill(4)(0xff.toByte) ++ "Tadb".getBytes("ISO-8859-1") ++
            md5(le(id, 8)).take(4)
          (u48v, uev, o48v, oev, pc.doFinal(permsPlain))
        }
        def encStream(num: Int, data: Array[Byte]): Array[Byte] =
          if (v5) aesEnc(fileKey32, num, data) // AES-256-CBC, file key direct
          else if (aes) aesEnc(objKey(num), num, data)
          else rc4(objKey(num), data)
        def hex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
        val sb = new StringBuilder("%PDF-1.6\n")
        def obj(num: Int, dict: String, stream: Option[Array[Byte]]): Unit = {
          sb.append(s"$num 0 obj\n$dict\n")
          stream.foreach { st =>
            sb.append("stream\n")
            sb.append(new String(st, java.nio.charset.StandardCharsets.ISO_8859_1))
            sb.append("\nendstream\n")
          }
          sb.append("endobj\n")
        }
        obj(1, "<< /Type /Catalog /Pages 2 0 R >>", None)
        val pcount = 1 + (id % 3).toInt
        val kids = (0 until pcount).map(p => s"${10 + p} 0 R").mkString(" ")
        obj(2, s"<< /Type /Pages /Kids [ $kids ] /Count $pcount >>", None)
        for (p <- 0 until pcount) {
          val wc = 1 + ((id + p) % 8).toInt
          val words = Seq.fill(wc)("w").mkString(" ")
          val enc = encStream(20 + p, s"BT ($words) Tj ET".getBytes("ISO-8859-1"))
          obj(10 + p, s"<< /Type /Page /Parent 2 0 R /Contents ${20 + p} 0 R >>", None)
          obj(20 + p, s"<< /Length ${enc.length} >>", Some(enc))
        }
        if (v5)
          obj(5, "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
            "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
            "/StmF /StdCF /StrF /StdCF " +
            s"/O <${hex(o48)}> /OE <${hex(oe)}> /U <${hex(u48)}> " +
            s"/UE <${hex(ue)}> /Perms <${hex(perms)}> /P $pPerm >>", None)
        else {
          val mode =
            if (aes) "/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 " +
              "/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            else "/V 2 /R 3 /Length 128"
          obj(5, s"<< /Filter /Standard $mode /O <${hex(o)}> " +
            s"/U <${hex(u32)}> /P $pPerm >>", None)
        }
        sb.append(s"trailer\n<< /Root 1 0 R /Encrypt 5 0 R " +
          s"/ID [ <${hex(id0)}> <${hex(id0)}> ] >>\n%%EOF\n")
        sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** q367: a planted-count PDF wrapped in a real HTTP response (gzip on odd ids) inside a WARC response record. */
  def warcPdfDoc(id: Long): Array[Byte] = {

        val iso = java.nio.charset.StandardCharsets.ISO_8859_1
        val pcount = 1 + (id % 2).toInt
        val sb = new StringBuilder("%PDF-1.4\n")
        def obj(num: Int, dict: String, stream: Option[String]): Unit = {
          sb.append(s"$num 0 obj\n$dict\n")
          stream.foreach(st => sb.append(s"stream\n$st\nendstream\n"))
          sb.append("endobj\n")
        }
        obj(1, "<< /Type /Catalog /Pages 2 0 R >>", None)
        val kids = (0 until pcount).map(p => s"${10 + p} 0 R").mkString(" ")
        obj(2, s"<< /Type /Pages /Kids [ $kids ] /Count $pcount >>", None)
        obj(5, "<< /Subtype /Image /Width 30 /Height 40 /Length 1 >>", Some(" "))
        for (p <- 0 until pcount) {
          val wc = 2 + ((id + p) % 6).toInt
          val words = Seq.fill(wc)("w").mkString(" ")
          val content = s"BT ($words) Tj ET" +
            (if ((id + p) % 2 == 1) " /Im1 Do" else "")
          obj(10 + p, s"<< /Type /Page /Parent 2 0 R /Contents ${20 + p} 0 R " +
            "/Resources << /XObject << /Im1 5 0 R >> >> >>", None)
          obj(20 + p, s"<< /Length ${content.length} >>", Some(content))
        }
        sb.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
        val pdf = sb.toString.getBytes(iso)
        val (body, ce) =
          if (id % 2 == 1) {
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(pdf); gz.close()
            (bos.toByteArray, "Content-Encoding: gzip\r\n")
          } else (pdf, "")
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n$ce\r\n")
          .getBytes(iso) ++ body
        val wh = s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://pdfs.example/$id\r\n" +
          s"WARC-Payload-Digest: sha1:X$id\r\n" +
          s"Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${http.length}\r\n\r\n"
        wh.getBytes(iso) ++ http ++ "\r\n\r\n".getBytes(iso)
  }

  /** q369: six embedded-font classes (TrueType symbolic/dual-cmap,
    * Type1, CFF, Type0/Identity-H TrueType, OTTO CID-keyed CFF) built
    * from scratch per the public sfnt/TN#5176 layouts. */
  def fontClassDoc(id: Long): Array[Byte] = {

        val ISO = java.nio.charset.StandardCharsets.ISO_8859_1
        def be16(v: Int): Array[Byte] =
          Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def be32(v: Long): Array[Byte] =
          Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
        // magic 0x00010000 = TrueType outlines; 'OTTO' = CFF outlines
        def sfntM(magic: Long, tables: (String, Array[Byte])*): Array[Byte] = {
          var off = 12 + 16 * tables.length
          val dir = tables.map { case (tag, data) =>
            val rec = cat(tag.getBytes(ISO), be32(0), be32(off), be32(data.length))
            off += data.length; rec
          }
          cat((be32(magic) +: be16(tables.length) +: be16(0) +: be16(0) +:
            be16(0) +: dir) ++ tables.map(_._2): _*)
        }
        def sfnt(tables: (String, Array[Byte])*): Array[Byte] =
          sfntM(0x00010000L, tables: _*)
        def cmapTbl(subs: ((Int, Int), Array[Byte])*): Array[Byte] = {
          var off = 4 + 8 * subs.length
          val recs = subs.map { case ((plat, enc), data) =>
            val rec = cat(be16(plat), be16(enc), be32(off))
            off += data.length; rec
          }
          cat((be16(0) +: be16(subs.length) +: recs) ++ subs.map(_._2): _*)
        }
        def cmap4(pairs: (Int, Int)*): Array[Byte] = {
          val segs = pairs.sortBy(_._1).map { case (c, g) =>
            (c, c, (g - c) & 0xffff) } :+ ((0xFFFF, 0xFFFF, 1))
          val n = segs.length
          cat(Seq(be16(4), be16(16 + 8 * n), be16(0), be16(n * 2), be16(0),
            be16(0), be16(0)) ++ segs.map(x => be16(x._2)) ++ Seq(be16(0)) ++
            segs.map(x => be16(x._1)) ++ segs.map(x => be16(x._3)) ++
            segs.map(_ => be16(0)): _*)
        }
        def post2(custom: Seq[String]): Array[Byte] =
          cat(Seq(be32(0x00020000L), new Array[Byte](28),
            be16(custom.length + 1), be16(0)) ++
            custom.indices.map(k => be16(258 + k)) ++
            custom.map(nm => cat(Array(nm.length.toByte), nm.getBytes(ISO))): _*)
        // minimal CFF/Type1C (Adobe TN#5176): 1-byte-offset INDEXes,
        // charset format 0 (glyph → SID), encoding format 0
        def cffIdx(items: Array[Byte]*): Array[Byte] = {
          if (items.isEmpty) return be16(0)
          val offs = items.scanLeft(1)((o, it) => o + it.length)
          cat(Seq(be16(items.length), Array(1.toByte)) ++
            offs.map(o => Array(o.toByte)) ++ items: _*)
        }
        def cffFont(sids: Seq[Int], codes: Seq[Int]): Array[Byte] = {
          def op5(v: Int, op: Int): Array[Byte] =
            cat(Array(29.toByte), be32(v.toLong), Array(op.toByte))
          val header = Array[Byte](1, 0, 4, 1)
          val nameIdx = cffIdx("F".getBytes(ISO))
          val strIdx = be16(0)
          def topDict(cs: Int, enc: Int, chs: Int): Array[Byte] =
            cat(op5(cs, 15), op5(enc, 16), op5(chs, 17))
          val tdSize = cffIdx(topDict(0, 0, 0)).length
          val base = header.length + nameIdx.length + tdSize + strIdx.length
          val charset = cat(Array(0.toByte) +: sids.map(be16): _*)
          val encoding = cat(Array(0.toByte, codes.length.toByte),
            codes.map(c => c.toByte).toArray)
          val csAt = base; val encAt = csAt + charset.length
          val chsAt = encAt + encoding.length
          cat(header, nameIdx, cffIdx(topDict(csAt, encAt, chsAt)), strIdx,
            charset, encoding, cffIdx(Seq.fill(sids.length + 1)(Array[Byte](14)): _*))
        }
        // CID-keyed Type1C (TN#5176 §18): ROS in the top dict, charset
        // format 0 holding CIDs (gid g -> cids(g-1)), no Encoding op
        def cffCidFont(cids: Seq[Int]): Array[Byte] = {
          def int5(v: Int): Array[Byte] = cat(Array(29.toByte), be32(v.toLong))
          def op5(v: Int, op: Int): Array[Byte] = cat(int5(v), Array(op.toByte))
          val header = Array[Byte](1, 0, 4, 1)
          val nameIdx = cffIdx("F-CID".getBytes(ISO))
          val strIdx = be16(0)
          def topDict(cs: Int, chs: Int): Array[Byte] =
            cat(int5(391), int5(392), int5(0), Array(12.toByte, 30.toByte),
              op5(cs, 15), op5(chs, 17))
          val tdSize = cffIdx(topDict(0, 0)).length
          val base = header.length + nameIdx.length + tdSize + strIdx.length
          val charset = cat(Array(0.toByte) +: cids.map(be16): _*)
          val csAt = base; val chsAt = csAt + charset.length
          cat(header, nameIdx, cffIdx(topDict(csAt, chsAt)), strIdx,
            charset, cffIdx(Seq.fill(cids.length + 1)(Array[Byte](14)): _*))
        }
        val letter = ('a' + (id % 26)).toChar
        val wl = 3 + (id % 4).toInt
        val wc = 1 + (id % 7).toInt
        val simpleCodes = Seq.fill(wc)("" * wl).mkString("")
        // class 4 (Type0/Identity-H): 2-byte hex codes ARE glyph ids
        val cidCodes = Seq.fill(wc)("0003" * wl).mkString("0004")
        val sDict = "<< /Type /Font /Subtype /TrueType /BaseFont /Fake /FontDescriptor 6 0 R >>"
        val t1Dict = "<< /Type /Font /Subtype /Type1 /BaseFont /Fake /FontDescriptor 6 0 R >>"
        val sContent = s"BT /F1 12 Tf ($simpleCodes) Tj ET"
        val type0Dict = "<< /Type /Font /Subtype /Type0 /BaseFont /Fake " +
          "/Encoding /Identity-H /DescendantFonts [ 8 0 R ] >>"
        val cidContent = s"BT /F1 12 Tf <$cidCodes> Tj ET"
        val (font, fileKey, fontDict, content) = (id % 6) match {
          case 0 => (sfnt(
              "cmap" -> cmapTbl((3, 0) -> cmap4(0xF001 -> 1, 0xF002 -> 2)),
              "post" -> post2(Seq(letter.toString, "space"))),
            "/FontFile2", sDict, sContent)
          case 1 => (sfnt(
              "cmap" -> cmapTbl(
                (3, 0) -> cmap4(0xF001 -> 5, 0xF002 -> 6),
                (3, 1) -> cmap4(letter.toInt -> 5, 0x20 -> 6))),
            "/FontFile2", sDict, sContent)
          case 2 => ((s"/Encoding 256 array\ndup 1 /$letter put\n" +
              "dup 2 /space put\nreadonly def\neexec X").getBytes(ISO),
            "/FontFile", t1Dict, sContent)
          case 3 =>
            // CFF: glyph1 → the letter's standard SID (a..z = 66..91),
            // glyph2 → SID 1 (space); codes 1/2 → glyphs 1/2
            (cffFont(Seq(66 + (id % 26).toInt, 1), Seq(1, 2)),
              "/FontFile3", t1Dict, sContent)
          case 4 =>
            // Type0/Identity-H with NO ToUnicode: CIDs are glyph ids
            // (default /CIDToGIDMap), resolved through the DESCENDANT
            // font's inverted (3,1) Unicode cmap (letter → gid 3,
            // space → gid 4)
            (sfnt("cmap" -> cmapTbl(
                (3, 1) -> cmap4(letter.toInt -> 3, 0x20 -> 4))),
              "/FontFile2", type0Dict, cidContent)
          case _ =>
            // (f) r16: Type0/Identity-H whose DESCENDANT carries an
            // OTTO-wrapped CID-KEYED CFF (ROS) — the modern CJK-subset
            // shape (VERDICT r15 Missing #3). Codes are CIDs 3 (letter)
            // and 4 (space); the CFF charset maps gid 5 → CID 3 and
            // gid 6 → CID 4 (NON-identity, so skipping the charset
            // inversion garbles every word), and the wrapper's (3,1)
            // cmap maps letter → gid 5, space → gid 6.
            (sfntM(0x4F54544FL,
                "CFF " -> cffCidFont(Seq(7, 8, 9, 10, 3, 4)),
                "cmap" -> cmapTbl((3, 1) -> cmap4(letter.toInt -> 5, 0x20 -> 6))),
              "/FontFile3", type0Dict, cidContent)
        }
        val bos = new java.io.ByteArrayOutputStream()
        def w(str: String): Unit = bos.write(str.getBytes(ISO))
        def obj(num: Int, dict: String, stream: Option[Array[Byte]]): Unit = {
          w(s"$num 0 obj\n$dict\n")
          stream.foreach { st =>
            w("stream\n"); bos.write(st); w("\nendstream\n")
          }
          w("endobj\n")
        }
        w("%PDF-1.5\n")
        obj(1, "<< /Type /Catalog /Pages 2 0 R >>", None)
        obj(2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None)
        obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> >>", None)
        obj(4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO)))
        obj(5, fontDict, None)
        obj(6, s"<< /Type /FontDescriptor /FontName /Fake $fileKey 7 0 R >>", None)
        obj(7, s"<< /Length ${font.length} >>", Some(font))
        if (id % 6 == 4)
          obj(8, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake " +
            "/FontDescriptor 6 0 R >>", None)
        else if (id % 6 == 5)
          obj(8, "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Fake " +
            "/FontDescriptor 6 0 R >>", None)
        w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
        bos.toByteArray
  }

  /** q384: `/JPXDecode` payloads — a full JP2 container on even ids
    * (with an LBox=0 "to EOF" jp2c box on id%4==2, exercising the box
    * walk), a raw J2K codestream on odd ids. The SIZ segment plants
    * nonzero canvas offsets so the Xsiz-XOsiz arithmetic is pinned;
    * the codestream body is SOC+SIZ+EOC only (the engine surfaces
    * verbatim and reads dims — it never decodes wavelets). */
  def jpxDoc(id: Long): Array[Byte] = {
    val w = 20 + (id % 16).toInt; val h = 12 + (id % 10).toInt
    val xo = (id % 5).toInt; val yo = (id % 3).toInt
    val nc = 1 + (id % 3).toInt
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    // SIZ (ISO/IEC 15444-1 A.5.1): Lsiz = 38 + 3*Csiz, 8-bit unsigned
    // components at 1x1 subsampling
    val siz = cat(be16(0xFF51), be16(38 + 3 * nc), be16(0),
      be32(w + xo), be32(h + yo), be32(xo), be32(yo),
      be32(w + xo), be32(h + yo), be32(0), be32(0), be16(nc),
      cat(Seq.fill(nc)(Array[Byte](7, 1, 1)): _*))
    val codestream = cat(be16(0xFF4F), siz, be16(0xFFD9)) // SOC..EOC
    val payload =
      if (id % 2 == 1) codestream
      else {
        val sig = Array(0x00, 0x00, 0x00, 0x0C, 0x6A, 0x50, 0x20, 0x20,
          0x0D, 0x0A, 0x87, 0x0A).map(_.toByte)
        val ftyp = cat(be32(20), "ftyp".getBytes(ISO),
          "jp2 ".getBytes(ISO), be32(0), "jp2 ".getBytes(ISO))
        val ihdr = cat(be32(22), "ihdr".getBytes(ISO), be32(h), be32(w),
          be16(nc), Array[Byte](7, 7, 1, 0))
        val jp2h = cat(be32((8 + ihdr.length).toLong), "jp2h".getBytes(ISO), ihdr)
        val jp2c =
          if (id % 4 == 2) cat(be32(0), "jp2c".getBytes(ISO), codestream)
          else cat(be32((8 + codestream.length).toLong), "jp2c".getBytes(ISO),
            codestream)
        cat(sig, ftyp, jp2h, jp2c)
      }
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 8 /ColorSpace /DeviceRGB " +
        s"/Filter /JPXDecode /Length ${payload.length} >>", Some(payload))))
  }

  /** q385: 4-component (CMYK) JPEGs behind /DCTDecode — the
    * print-origin class (VERDICT r16 Missing #3). Even ids: a plain
    * 4-comp JPEG written by the JDK raster writer with the planted
    * (c,m,y,k) stored directly (uniform color round-trips EXACTLY
    * through the writer's DC-only blocks — verified over all planted
    * values and dims). Odd ids: the Adobe shape — samples stored
    * INVERTED with an APP14 (transform 0) marker spliced after SOI,
    * which a conformant reader must un-invert. */
  def cmykJpegDoc(id: Long): Array[Byte] = {
    val w = 7 + (id % 9).toInt; val h = 5 + (id % 7).toInt
    val c = ((id * 3) % 256).toInt; val m = ((id * 7) % 256).toInt
    val y = ((id * 11) % 256).toInt; val k = ((id * 5) % 256).toInt
    val adobe = id % 2 == 1
    val raster = java.awt.image.Raster.createInterleavedRaster(
      java.awt.image.DataBuffer.TYPE_BYTE, w, h, 4, null)
    val vals = Array(c, m, y, k).map(v => if (adobe) 255 - v else v)
    var yy = 0
    while (yy < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < 4) { raster.setSample(x, yy, b, vals(b)); b += 1 }
        x += 1
      }
      yy += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(raster, null, null), null)
    ios.close(); wr.dispose()
    val plain = bos.toByteArray
    val jpeg =
      if (!adobe) plain
      else {
        // Adobe APP14: FFEE len=14 'Adobe' ver flags0 flags1 transform=0
        val app14 = Array(0xFF, 0xEE, 0, 14, 'A', 'd', 'o', 'b', 'e',
          0, 100, 0, 0, 0, 0, 0).map(_.toByte)
        val out = new Array[Byte](plain.length + app14.length)
        System.arraycopy(plain, 0, out, 0, 2)
        System.arraycopy(app14, 0, out, 2, app14.length)
        System.arraycopy(plain, 2, out, 2 + app14.length, plain.length - 2)
        out
      }
    imagePage(9, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 8 /ColorSpace /DeviceCMYK " +
        s"/Filter /DCTDecode /Length ${jpeg.length} >>", Some(jpeg))))
  }

  /** q407: YCCK JPEGs behind /DCTDecode (r19 — VERDICT r18 Missing
    * #4, the Photoshop-CMYK-with-color-transform class): the stored
    * channels are (Y, Cb, Cr, K′) — the Adobe-inverted CMY channels
    * pushed through the JFIF forward transform, K inverted directly —
    * marked by an APP14 with transform byte 2. The fixture plants the
    * STORED samples (uniform colors round-trip exactly through the
    * writer's DC-only blocks, the q385-verified property), so the
    * oracle replays the decoder's inverse-transform arithmetic term
    * by term; a missed inverse, wrong matrix constant, or rounding
    * slip shifts every channel and breaks the hash tri-scale. */
  def ycckJpegDoc(id: Long): Array[Byte] = {
    val w = 7 + (id % 9).toInt; val h = 5 + (id % 7).toInt
    val ys = ((id * 3) % 256).toInt; val cb = ((id * 7) % 256).toInt
    val cr = ((id * 11) % 256).toInt; val ks = ((id * 5) % 256).toInt
    val raster = java.awt.image.Raster.createInterleavedRaster(
      java.awt.image.DataBuffer.TYPE_BYTE, w, h, 4, null)
    val vals = Array(ys, cb, cr, ks)
    var yy = 0
    while (yy < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < 4) { raster.setSample(x, yy, b, vals(b)); b += 1 }
        x += 1
      }
      yy += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(raster, null, null), null)
    ios.close(); wr.dispose()
    val plain = bos.toByteArray
    // Adobe APP14: FFEE len=14 'Adobe' ver flags0 flags1 transform=2
    val app14 = Array(0xFF, 0xEE, 0, 14, 'A', 'd', 'o', 'b', 'e',
      0, 100, 0, 0, 0, 0, 2).map(_.toByte)
    val jpeg = new Array[Byte](plain.length + app14.length)
    System.arraycopy(plain, 0, jpeg, 0, 2)
    System.arraycopy(app14, 0, jpeg, 2, app14.length)
    System.arraycopy(plain, 2, jpeg, 2 + app14.length, plain.length - 2)
    imagePage(9, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 8 /ColorSpace /DeviceCMYK " +
        s"/Filter /DCTDecode /Length ${jpeg.length} >>", Some(jpeg))))
  }

  /** q386: JBIG2 HUFFMAN-coded symbol-dictionary + text-region
    * streams (T.88 SDHUFF=SBHUFF=1, standard Annex B tables) painting
    * the same planted vertical split as q379's arithmetic legs —
    * (0) uncompressed collective bitmaps, (1) MMR (T.6) collective
    * bitmaps, (2) transposed text region; odd ids add /Decode [1 0].
    * One or two full-height glyph rectangles compose the split, so
    * the height-class width split is exercised whenever two glyphs
    * share the class. */
  def jbig2HuffmanDoc(id: Long): Array[Byte] = {
    val w = 18 + (id % 8).toInt; val h = 8 + (id % 6).toInt
    val xsplit = 2 + (id % (w - 4)).toInt
    val black = w - xsplit
    val a = math.max(1, black / 2); val b = black - a
    val glyphs = Seq((a, h, Array.fill(a * h)(true))) ++
      (if (b > 0) Seq((b, h, Array.fill(b * h)(true))) else Nil)
    val places = Seq((0, xsplit, 0)) ++
      (if (b > 0) Seq((1, xsplit + a, 0)) else Nil)
    val stream = (id % 3).toInt match {
      case 0 => graft.sources.Jbig2.encodeEmbeddedTextHuffman(
        glyphs, places, w, h)
      case 1 => graft.sources.Jbig2.encodeEmbeddedTextHuffman(
        glyphs, places, w, h, mmr = true)
      case _ => graft.sources.Jbig2.encodeEmbeddedTextHuffman(
        glyphs, places, w, h, transposed = true)
    }
    val decodeKey = if (id % 2 == 1) "/Decode [1 0] " else ""
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        s"$decodeKey/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q387: CIE color spaces — (0) a /Lab raster with a planted
    * uniform (L*,a*,b*) triple and the default Range, (1) a /CalRGB
    * raster (un-color-managed DeviceRGB alias), (2) a /CalGray
    * raster. The Lab leg's conversion is pure IEEE arithmetic the
    * oracle mirrors term by term. */
  def labDoc(id: Long): Array[Byte] = {
    val w = 6 + (id % 8).toInt; val h = 5 + (id % 6).toInt
    val extra = (id % 3).toInt match {
      case 0 =>
        val px = new Array[Byte](w * h * 3)
        val (ls, as_, bs) = (((id * 3) % 256).toInt, ((id * 7) % 256).toInt,
          ((id * 11) % 256).toInt)
        var i = 0
        while (i < px.length) {
          px(i) = ls.toByte; px(i + 1) = as_.toByte; px(i + 2) = bs.toByte
          i += 3
        }
        Seq((5, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace [/Lab << " +
          "/WhitePoint [0.9642 1.0 0.8249] >>] " +
          s"/Length ${px.length} >>", Some(px)))
      case 1 =>
        val (r, g, b) = (((id * 5) % 256).toInt, ((id * 9) % 256).toInt,
          ((id * 13) % 256).toInt)
        val px = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
          i += 3
        }
        Seq((5, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace [/CalRGB << " +
          "/WhitePoint [0.9505 1.0 1.089] /Gamma [2.2 2.2 2.2] >>] " +
          s"/Length ${px.length} >>", Some(px)))
      case _ =>
        val g = ((id * 17) % 256).toInt
        val px = Array.fill(w * h)(g.toByte)
        Seq((5, s"<< /Subtype /Image /Width $w /Height $h " +
          "/BitsPerComponent 8 /ColorSpace [/CalGray << " +
          "/WhitePoint [0.9505 1.0 1.089] >>] " +
          s"/Length ${px.length} >>", Some(px)))
    }
    imagePage(9, extra)
  }

  /** q388: JBIG2 HALFTONE regions (T.88 §6.6/§6.7) — a pattern
    * dictionary of density patterns (pattern k = exactly k black
    * pixels) and a planted two-value grid (left columns vA, right
    * vB), so the page's black count is closed-form in doc_id. Gray
    * values span the pattern count, so multiple Gray-coded bitplanes
    * decode per doc. */
  def jbig2HalftoneDoc(id: Long): Array[Byte] = {
    val p = 2 + (id % 3).toInt
    val count = p * p + 1
    val hgw = 3 + (id % 4).toInt; val hgh = 2 + (id % 3).toInt
    val w = hgw * p; val h = hgh * p
    val vA = ((id * 3) % count).toInt; val vB = ((id * 5) % count).toInt
    val nLeft = hgw / 2
    val patterns = (0 until count).map(k => Array.tabulate(p * p)(_ < k))
    val values = Array.tabulate(hgw * hgh)(i =>
      if (i % hgw < nLeft) vA else vB)
    val stream = graft.sources.Jbig2.encodeEmbeddedHalftone(
      values, hgw, hgh, patterns, p, w, h)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q398: JBIG2 generic REFINEMENT regions (T.88 §6.3, r18 — the
    * final JBIG2 segment family): a striped base bitmap enters as an
    * intermediate (type 36) or painted (type 38) region, then a
    * type 42 refinement decodes the base with a planted rectangle
    * INVERTED, cycling GRTEMPLATE 0/1, TPGRON, and the
    * referred-vs-page reference shapes. Page black count is
    * closed-form: stripes XOR rectangle. */
  def jbig2RefinementDoc(id: Long): Array[Byte] = {
    val w = 8 + (id % 5).toInt * 3
    val h = 6 + (id % 4).toInt * 3
    val x0 = (id % 3).toInt; val y0 = (id % 2).toInt
    val rw = 3 + (id % 4).toInt; val rh = 2 + (id % 3).toInt
    val base = Array.tabulate(w * h)(i => (i % w) % 4 < 2)
    val refined = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val inRect = x >= x0 && x < x0 + rw && y >= y0 && y < y0 + rh
      base(i) != inRect // XOR: rectangle inverted
    }
    val stream = graft.sources.Jbig2.encodeEmbeddedRefinement(
      base, refined, w, h,
      viaIntermediate = id % 4 < 2,
      template = (id % 2).toInt,
      tpgron = id % 3 == 0)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q402: in-document images across the non-PDF classes (r18 — the
    * decodeWithImages parity PyMuPDF has): per doc ONE planted-color
    * PNG embedded as (0) an EPUB chapter `<img>` + archive entry,
    * (1) an FB2 base64 `<binary>` referenced by the section's
    * `<image href="#…"/>`, (2) an XPS ImageBrush part, (3) a MOBI
    * image record referenced by `<img recindex=…>` via the header's
    * first-image-index field, (4, r19) an SVG base64 data-URI
    * `<image>` with a dangling file-ref decoy that must be skipped.
    * Same dim/color laws as q394 at g=0. */
  def docImagesDoc(id: Long): Array[Byte] = {
    val w = 6 + (id % 10).toInt; val h = 5 + (id % 7).toInt
    val (r, g, b) = (((id * 3) % 256).toInt, ((id * 5) % 256).toInt,
      ((id * 7) % 256).toInt)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    try { gr.setColor(new java.awt.Color(r, g, b)); gr.fillRect(0, 0, w, h) }
    finally gr.dispose()
    val ib = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", ib)
    val png = ib.toByteArray
    def zip(entries: (String, Array[Byte])*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      for ((n, body) <- entries) {
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(body)
        zos.closeEntry()
      }
      zos.close()
      bos.toByteArray
    }
    def s(x: String): Array[Byte] =
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (id % 5).toInt match {
      case 4 =>
        // SVG (r19): the raster rides a base64 data-URI <image>; a
        // dangling file ref decoy must be skipped (no archive to
        // resolve against)
        s("""<?xml version="1.0"?>""" +
          """<svg xmlns="http://www.w3.org/2000/svg" """ +
          """xmlns:xlink="http://www.w3.org/1999/xlink">""" +
          """<text x="1" y="5">w w</text>""" +
          """<image width="4" height="4" href="missing.png"/>""" +
          """<image width="4" height="4" xlink:href="data:image/png;base64,""" +
          java.util.Base64.getEncoder.encodeToString(png) +
          "\"/></svg>")
      case 0 =>
        zip(
          "META-INF/container.xml" -> s(
            """<?xml version="1.0"?><container><rootfiles>""" +
              """<rootfile full-path="OEBPS/content.opf"/>""" +
              "</rootfiles></container>"),
          "OEBPS/content.opf" -> s(
            """<?xml version="1.0"?><package><manifest>""" +
              """<item id="c0" href="ch0.xhtml"/></manifest>""" +
              """<spine><itemref idref="c0"/></spine></package>"""),
          "OEBPS/ch0.xhtml" -> s(
            """<html><body><p>w w</p><img src="img/pic.png"/></body></html>"""),
          "OEBPS/img/pic.png" -> png)
      case 1 =>
        s("""<?xml version="1.0" encoding="utf-8"?>""" +
          """<FictionBook xmlns="http://www.gribuser.ru/xml/fictionbook/2.0">""" +
          """<description/><body><section><p>w w</p>""" +
          """<image l:href="#pic"/></section></body>""" +
          """<binary id="pic" content-type="image/png">""" +
          java.util.Base64.getEncoder.encodeToString(png) +
          "</binary></FictionBook>")
      case 2 =>
        zip(
          "_rels/.rels" -> s(
            """<Relationships><Relationship Type=""" +
              """"http://schemas.microsoft.com/xps/2005/06/fixedrepresentation" """ +
              """Target="/s.fdseq"/></Relationships>"""),
          "s.fdseq" -> s(
            """<FixedDocumentSequence>""" +
              """<DocumentReference Source="/d.fdoc"/>""" +
              "</FixedDocumentSequence>"),
          "d.fdoc" -> s(
            """<FixedDocument><PageContent Source="/p0.fpage"/></FixedDocument>"""),
          "p0.fpage" -> s(
            """<FixedPage Width="816" Height="1056">""" +
              """<Glyphs UnicodeString="w w"/>""" +
              """<Path><Path.Fill><ImageBrush ImageSource="/res/pic.png"/>""" +
              "</Path.Fill></Path></FixedPage>"),
          "res/pic.png" -> png)
      case _ =>
        // MOBI: one stored text record + one image record; the MOBI
        // header's first-image-index (offset 0x6C) points at it
        val text = s("""<p>w w</p><img recindex="00001"/>""")
        def be16(v: Int): Array[Byte] =
          Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def be32(v: Long): Array[Byte] =
          Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        val mobi = new Array[Byte](0xE8)
        System.arraycopy("MOBI".getBytes(ISO), 0, mobi, 0, 4)
        System.arraycopy(be32(0xE8L), 0, mobi, 4, 4)
        System.arraycopy(be32(65001L), 0, mobi, 12, 4) // codec = UTF-8 (r19)
        // first-image-index lives at RECORD-0 offset 0x6C (the public
        // MOBI layout counts from record 0) = MOBI-header offset 0x5C
        System.arraycopy(be32(2L), 0, mobi, 0x5C, 4) // first image = rec 2
        val rec0 = be16(1) ++ be16(0) ++ be32(text.length.toLong) ++
          be16(1) ++ be16(4096) ++ be16(0) ++ be16(0) ++ mobi
        val all = Seq(rec0, text, png)
        val headerLen = 78 + 8 * all.length + 2
        val offs = all.scanLeft(headerLen)((a, r) => a + r.length).init
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(new Array[Byte](32))
        bos.write(be16(0)); bos.write(be16(0))
        bos.write(new Array[Byte](24))
        bos.write("BOOKMOBI".getBytes(ISO))
        bos.write(be32(0)); bos.write(be32(0))
        bos.write(be16(all.length))
        for ((off, k) <- offs.zipWithIndex) {
          bos.write(be32(off.toLong))
          bos.write(0); bos.write(be32(k.toLong).drop(1))
        }
        bos.write(be16(0))
        all.foreach(r => bos.write(r))
        bos.toByteArray
    }
  }

  /** q408 (r19): a BARE raster payload — the fitz image-document
    * class ([[graft.sources.ImageDocs]]): one uniform planted-color
    * raster per doc, the CONTAINER cycling the four JDK-writable
    * lossless formats (png/bmp/gif/tiff — uniform color survives all
    * four exactly, so luminance stays closed-form). Same dim/color
    * laws as q402. */
  def imageDoc(id: Long): Array[Byte] = {
    val w = 6 + (id % 10).toInt; val h = 5 + (id % 7).toInt
    val (r, g, b) = (((id * 3) % 256).toInt, ((id * 5) % 256).toInt,
      ((id * 7) % 256).toInt)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    try { gr.setColor(new java.awt.Color(r, g, b)); gr.fillRect(0, 0, w, h) }
    finally gr.dispose()
    val fmt = Seq("png", "bmp", "gif", "tiff")((id % 4).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    // write returns FALSE (no exception) when the JRE lacks a writer
    // for the format — fail loudly here, not as an oracle hash miss
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** q410 (r19): binary Netpbm rasters — the fitz-openable family
    * decoded from scratch with REAL luminance (raw samples, no
    * codec needed): legs cycle P4 (bilevel, first row black, width
    * not byte-aligned so row padding is exercised), P5 (uniform
    * gray), P6 (uniform RGB, q402 color law); odd ids carry a
    * `#`-comment inside the header. Shared q402 dims law. */
  def pnmDoc(id: Long): Array[Byte] = {
    val w = 6 + (id % 10).toInt; val h = 5 + (id % 7).toInt
    val comment = if (id % 2 == 1) "# planted\n" else ""
    def s(x: String) = x.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    (id % 3).toInt match {
      case 0 => // P4: first row black (1 = black), MSB-first padded rows
        val rowBytes = (w + 7) / 8
        val raster = new Array[Byte](rowBytes * h)
        for (x <- 0 until w)
          raster(x >> 3) = (raster(x >> 3) | (1 << (7 - (x & 7)))).toByte
        s(s"P4\n$comment$w $h\n") ++ raster
      case 1 => // P5: uniform gray
        val g = ((id * 11) % 256).toInt
        s(s"P5\n$comment$w $h\n255\n") ++ Array.fill[Byte](w * h)(g.toByte)
      case _ => // P6: uniform RGB, q402 color law
        val (r, g, b) = (((id * 3) % 256).toInt, ((id * 5) % 256).toInt,
          ((id * 7) % 256).toInt)
        val raster = new Array[Byte](w * h * 3)
        for (i <- 0 until w * h) {
          raster(i * 3) = r.toByte; raster(i * 3 + 1) = g.toByte
          raster(i * 3 + 2) = b.toByte
        }
        s(s"P6\n$comment$w $h\n255\n") ++ raster
    }
  }

  /** q411 (r19): minimal PSD documents (Adobe header layout: "8BPS"
    * v1, reserved zeros, 3 channels, BE32 height/width, depth 8,
    * RGB mode; zero-length color-mode/resources/layer sections,
    * raw-data compression, planar channel data). Dims-only contract
    * — the engine surfaces header dims with luminance ABSENT (the
    * Jpx discipline; no JDK PSD codec exists). Shared q402 dims
    * law. */
  def psdDoc(id: Long): Array[Byte] = {
    val w = 6 + (id % 10).toInt; val h = 5 + (id % 7).toInt
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val header = "8BPS".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      be16(1) ++ new Array[Byte](6) ++ be16(3) ++
      be32(h.toLong) ++ be32(w.toLong) ++ be16(8) ++ be16(3)
    header ++ be32(0) ++ be32(0) ++ be32(0) ++ be16(0) ++
      Array.fill[Byte](w * h * 3)(((id * 13) % 256).toByte)
  }

  /** q401: JBIG2 CUSTOM Huffman tables (T.88 §B.2 / segment type 53,
    * r18 — the last Huffman class besides refinement tables): a
    * Huffman-coded text region whose DT deltas ride a custom table
    * segment (select 3), placing two solid k×k glyphs; the second
    * strip's T delta cycles 0..7 so several custom codewords decode
    * per corpus. Black count = 2k². */
  def jbig2CustomTableDoc(id: Long): Array[Byte] = {
    val k = 2 + (id % 3).toInt
    val w = 2 * k + 4; val h = k + 9
    val solid = Array.fill(k * k)(true)
    val y2 = 1 + (id % 8).toInt
    val stream = graft.sources.Jbig2.encodeEmbeddedTextHuffman(
      Seq((k, k, solid)),
      Seq((0, 1, 1), (0, k + 2, y2)),
      w, h, customDt = true)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q409 (r19): minimal AVI containers (RIFF `AVI ` → `LIST hdrl` →
    * `avih` AVIMAINHEADER, the public layout): planted µs/frame (a
    * multiple of 1000 so duration-ms is exact integer arithmetic),
    * total frames, stream count, dims. Odd ids carry a `JUNK` chunk
    * with an ODD size before the header list (the real-world padding
    * shape — exercises word alignment), and every container carries a
    * `LIST movi` decoy after the header. */
  def aviDoc(id: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def chunk(idc: String, body: Array[Byte]): Array[Byte] =
      cc(idc) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val usPerFrame = 1000L * (10 + id % 24)
    val totalFrames = 100 + id % 900
    val streams = 1 + id % 3
    val w = 320 + (id % 16) * 8; val h = 180 + (id % 9) * 20
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(totalFrames) ++ le32(0) ++ le32(streams) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = chunk("LIST", cc("hdrl") ++ chunk("avih", avih))
    val junk = if (id % 2 == 1) chunk("JUNK", Array.fill[Byte](7)(0)) // odd size
               else Array.empty[Byte]
    val movi = chunk("LIST", cc("movi") ++ chunk("00dc", Array.fill[Byte](4)(0)))
    val body = cc("AVI ") ++ junk ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** q400: minimal Matroska/WebM containers (RFC 8794 EBML) — EBML
    * header with the DocType cycling matroska/webm, Segment → Info
    * (TimestampScale OMITTED on id%3==0 to exercise the 1e6 default,
    * else planted 500k/250k ns ticks; Duration an 8-byte float of
    * ticks chosen so ms is exact) → Tracks (a video TrackEntry with
    * planted PixelWidth/PixelHeight; odd ids add an audio TrackEntry
    * with no Video element that must not displace the dims). */
  def mkvDoc(id: Long): Array[Byte] = {
    def sizeOf(n: Long): Array[Byte] =
      // 8-byte size form: 0x01 marker then 7 payload bytes
      Array(0x01.toByte) ++ (6 to 0 by -1).map(i =>
        ((n >>> (8 * i)) & 0xff).toByte).toArray
    def el(idBytes: Array[Byte], body: Array[Byte]): Array[Byte] =
      idBytes ++ sizeOf(body.length.toLong) ++ body
    def id1(v: Int) = Array(v.toByte)
    def id2(v: Int) = Array((v >> 8).toByte, v.toByte)
    def id3(v: Int) = Array((v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def id4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def uintBody(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      ((n - 1) to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    }
    val docType = if (id % 2 == 0) "matroska" else "webm"
    val ms = 2000L + id % 9000
    val (scaleEl, ticks) = (id % 3).toInt match {
      case 0 => (Array.emptyByteArray, ms) // default 1e6 ns ticks
      case 1 => (el(id3(0x2AD7B1), uintBody(500000L)), ms * 2)
      case _ => (el(id3(0x2AD7B1), uintBody(250000L)), ms * 4)
    }
    val durBits = java.lang.Double.doubleToLongBits(ticks.toDouble)
    val w = 320 + (id % 16).toInt * 8; val h = 180 + (id % 9).toInt * 20
    val ebml = el(id4(0x1A45DFA3L),
      el(id2(0x4282), docType.getBytes(ISO)))
    val info = el(id4(0x1549A966L),
      scaleEl ++ el(id2(0x4489), (7 to 0 by -1).map(i =>
        ((durBits >>> (8 * i)) & 0xff).toByte).toArray))
    val videoTrack = el(id1(0xAE),
      el(id1(0x83), uintBody(1L)) ++
        el(id1(0xE0),
          el(id1(0xB0), uintBody(w.toLong)) ++
            el(id1(0xBA), uintBody(h.toLong))))
    val audioTrack =
      if (id % 2 == 1) el(id1(0xAE), el(id1(0x83), uintBody(2L)))
      else Array.emptyByteArray
    val tracks = el(id4(0x1654AE6BL), videoTrack ++ audioTrack)
    ebml ++ el(id4(0x18538067L), info ++ tracks)
  }

  /** q405: JBIG2 HUFFMAN-coded refinement (T.88 §6.4.11 with
    * SBHUFF=1, r19 — VERDICT r18 Missing #2, the last text-region
    * class): the q399 even-leg geometry (a plain k×k solid instance
    * plus an instance refined into a (k+1)×(k+1) hollow border)
    * driven through an SBHUFF text region whose refinement deltas
    * ride the standard B.14 (RDW/RDH) and B.15 (RDX/RDY) tables and
    * whose per-instance arithmetic block is BMSIZE-framed (B.1). The
    * GR template cycles 0/1. Black counts are closed-form in doc_id,
    * so a table-line error, canonical-code slip, RI misread, or
    * block-framing bug shears pixels and breaks the hash tri-scale. */
  def jbig2HuffmanRefineDoc(id: Long): Array[Byte] = {
    val k = 2 + (id % 3).toInt
    val w = 2 * k + 6; val h = k + 3
    val solid = Array.fill(k * k)(true)
    def hollow(n: Int): Array[Boolean] = Array.tabulate(n * n) { i =>
      val x = i % n; val y = i / n
      x == 0 || y == 0 || x == n - 1 || y == n - 1
    }
    val template = ((id / 2) % 2).toInt
    val stream = graft.sources.Jbig2.encodeEmbeddedRefinedTextHuffman(
      Seq((k, k, solid)),
      Seq((0, 1, 1, None),
        (0, k + 3, 1, Some((1, 1, 0, 0, hollow(k + 1))))),
      w, h, sbrTemplate = template)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q406: MULTI-instance SDREFAGG (T.88 §6.5.8.2.1, r19 — VERDICT
    * r18 Missing #3): dictionary B derives one (2k+1)×k aggregate
    * symbol from TWO nested-text-region instances — a refined one
    * (the imported solid k×k turned into a hollow border, IARI=1) at
    * x=0 and a plain placement of the import (IARI=0) at x=k+1 — and
    * a final text region places the import and the aggregate side by
    * side. Black counts are closed-form (2k² + 4k − 4), so an IAAI
    * misread, nested-region S/T slip, shared-statistics break, or
    * composition bug breaks the hash tri-scale. GR template cycles. */
  def jbig2MultiAggDoc(id: Long): Array[Byte] = {
    val k = 2 + (id % 3).toInt
    val w = 3 * k + 4; val h = k + 2
    val solid = Array.fill(k * k)(true)
    val hollow = Array.tabulate(k * k) { i =>
      val x = i % k; val y = i / k
      x == 0 || y == 0 || x == k - 1 || y == k - 1
    }
    val template = ((id / 2) % 2).toInt
    val stream = graft.sources.Jbig2.encodeEmbeddedMultiAggText(
      Seq((k, k, solid)),
      aggW = 2 * k + 1, aggH = k,
      aggInstances = Seq(
        (0, 0, 0, Some((0, 0, 0, 0, hollow))),
        (0, k + 1, 0, None)),
      instances = Seq((0, 1, 1), (1, k + 2, 1)),
      w, h, sdrTemplate = template)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q399: JBIG2 refinement-coded SYMBOLS (T.88 §6.4.11 / §6.5.8.2,
    * r18 — the per-glyph second pass real scanner output uses): even
    * ids exercise SBREFINE (a text-region instance refines the solid
    * k×k glyph into a (k+1)×(k+1) hollow border), odd ids SDREFAGG (a
    * second dictionary derives a hollow k×k symbol from the imported
    * solid one). Black counts are closed-form in doc_id; the GR
    * template cycles 0/1. */
  def jbig2RefinedSymbolsDoc(id: Long): Array[Byte] = {
    val k = 2 + (id % 3).toInt
    val w = 2 * k + 6; val h = k + 3
    val solid = Array.fill(k * k)(true)
    def hollow(n: Int): Array[Boolean] = Array.tabulate(n * n) { i =>
      val x = i % n; val y = i / n
      x == 0 || y == 0 || x == n - 1 || y == n - 1
    }
    val template = ((id / 2) % 2).toInt
    val stream =
      if (id % 2 == 0)
        graft.sources.Jbig2.encodeEmbeddedRefinedText(
          Seq((k, k, solid)),
          Seq((0, 1, 1, None),
            (0, k + 3, 1, Some((1, 1, 0, 0, hollow(k + 1))))),
          w, h, sbrTemplate = template)
      else
        graft.sources.Jbig2.encodeEmbeddedAggText(
          Seq((k, k, solid)),
          Seq((0, k, k, 0, 0, hollow(k))),
          Seq((0, 1, 1), (1, k + 3, 1)),
          w, h, sdrTemplate = template)
    imagePage(10, Seq(
      (5, s"<< /Subtype /Image /Width $w /Height $h " +
        "/BitsPerComponent 1 /ColorSpace /DeviceGray " +
        "/Filter /JBIG2Decode " +
        s"/Length ${stream.length} >>", Some(stream))))
  }

  /** q389: compressed-audio headers (r17, extended r18 — the audio
    * twin of the JPX discipline: header-only metadata, no codec):
    * (0) a FLAC STREAMINFO block with planted rate/channels/total-
    * samples, (1) an MPEG1 Layer III CBR stream behind an ID3v2 tag
    * with a planted frame count, (2) a real PCM16 WAV through the JDK
    * writer, (3 r18) an Ogg/Opus chain — OpusHead BOS page with
    * planted channels/pre-skip/input-rate, OpusTags, and an EOS audio
    * page whose granule position plants the sample count, (4 r18) an
    * AAC ADTS frame walk with planted frequency index, channel
    * config, and frame count. */
  def audioDoc(id: Long): Array[Byte] = (id % 5).toInt match {
    case 0 =>
      val sr = Array(44100, 48000, 32000, 22050)((id % 4).toInt)
      val ch = 1 + (id % 2).toInt
      val total = 1000L + id % 5000
      val l = (sr.toLong << 44) | ((ch - 1).toLong << 41) |
        (15L << 36) | total // bps-1 = 15 (16-bit)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("fLaC".getBytes(ISO))
      bos.write(0x80); bos.write(0); bos.write(0); bos.write(34)
      // min/max block size, min/max frame size
      bos.write(Array[Byte](0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0))
      for (i <- 7 to 0 by -1) bos.write(((l >>> (8 * i)) & 0xff).toInt)
      bos.write(new Array[Byte](16)) // md5 of nothing
      bos.toByteArray
    case 1 =>
      val srIdx = (id % 3).toInt
      val sr = Array(44100, 48000, 32000)(srIdx)
      val stereo = id % 2 == 0
      val n = 2 + (id % 6).toInt
      val brIdx = 9 // 128 kbps (MPEG1 Layer III)
      val size = 144 * 128000 / sr
      val bos = new java.io.ByteArrayOutputStream()
      // ID3v2 header: 'ID3' v2.3, no flags, 10-byte synchsafe body
      bos.write("ID3".getBytes(ISO))
      bos.write(Array[Byte](3, 0, 0, 0, 0, 0, 10))
      bos.write(new Array[Byte](10))
      for (_ <- 0 until n) {
        bos.write(0xFF); bos.write(0xFB) // MPEG1 Layer III, no CRC
        bos.write((brIdx << 4) | (srIdx << 2)) // no padding
        bos.write(if (stereo) 0x00 else 0xC0) // channel mode
        bos.write(new Array[Byte](size - 4))
      }
      bos.toByteArray
    case 2 =>
      val sr = 8000 + (id % 4).toInt * 4000
      val frames = 500 + (id % 100).toInt
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val data = new Array[Byte](frames * 2)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    case 3 =>
      // Ogg pages (RFC 3533) carrying OpusHead (RFC 7845) or, on
      // id%10==8 (r18), a Vorbis identification header — granules are
      // raw PCM samples for Vorbis, pre-skipped 48 kHz for Opus
      val vorbis = id % 10 == 8
      val rate = Array(48000, 44100, 16000, 24000)((id % 4).toInt)
      val ch = 1 + (id % 2).toInt
      val preskip = if (vorbis) 0 else 312
      val total = 3000L + id % 4000
      def le16(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def le32(v: Long): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def le64(v: Long): Array[Byte] = le32(v & 0xFFFFFFFFL) ++ le32(v >>> 32)
      def page(htype: Int, granule: Long, seq: Int,
               payload: Array[Byte], serial: Long = 0x6F70L): Array[Byte] = {
        // lacing: 255-runs + terminator (payloads here are < 255)
        val full = payload.length / 255
        val lacing = Array.fill(full)(255.toByte) :+
          (payload.length % 255).toByte
        "OggS".getBytes(ISO) ++ Array[Byte](0, htype.toByte) ++
          le64(granule) ++ le32(serial) ++ le32(seq.toLong) ++
          le32(0L) ++ Array((lacing.length & 0xff).toByte) ++
          lacing ++ payload
      }
      val head =
        if (vorbis)
          Array[Byte](1) ++ "vorbis".getBytes(ISO) ++ le32(0L) ++
            Array(ch.toByte) ++ le32(rate.toLong) ++
            le32(0L) ++ le32(0L) ++ le32(0L) ++
            Array[Byte](0x66, 0x01) // blocksizes 2^6/2^6, framing 1
        else "OpusHead".getBytes(ISO) ++
          Array[Byte](1, ch.toByte) ++ le16(preskip) ++ le32(rate.toLong) ++
          le16(0) ++ Array[Byte](0) // gain 0, mapping family 0
      val tags =
        if (vorbis) Array[Byte](3) ++ "vorbis".getBytes(ISO) ++
          le32(5L) ++ "graft".getBytes(ISO) ++ le32(0L)
        else "OpusTags".getBytes(ISO) ++ le32(5L) ++
          "graft".getBytes(ISO) ++ le32(0L)
      val audio = Array.fill(40 + (id % 20).toInt)(0x5A.toByte)
      if (id % 20 == 13) {
        // r19 (ADVICE r18): a MULTIPLEXED stream — a second logical
        // stream's pages (different serial, its own granule clock, a
        // huge EOS granule AFTER the audio EOS) interleave; granule
        // tracking that ignores serials would misreport frames. The
        // audio page itself is split so a CONTINUATION page carries
        // granule -1 (the "no packet completes" sentinel).
        page(2, 0, 0, head) ++ page(0, 0, 1, tags) ++
          page(2, 0, 0, "fishead".getBytes(ISO), serial = 0x1234L) ++
          page(1, -1L, 2, Array.fill(255)(0x5A.toByte)) ++
          page(4, preskip + total, 3, audio) ++
          page(4, 999999999L, 1, Array.emptyByteArray, serial = 0x1234L)
      } else
        page(2, 0, 0, head) ++ page(0, 0, 1, tags) ++
          page(4, preskip + total, 2, audio)
    case _ =>
      // AAC ADTS: ISO/IEC 13818-7 §6.2 headers, planted frame count
      val srIdx = 3 + (id % 3).toInt // 48000 / 44100 / 32000
      val chanCfg = 1 + (id % 2).toInt
      val n = 2 + (id % 5).toInt
      val payLen = 20 + (id % 10).toInt
      val frameLen = 7 + payLen
      val bos = new java.io.ByteArrayOutputStream()
      if (id % 10 == 9) { // r18: the common ID3-tagged .aac shape —
        // r19 (ADVICE r18): with the FOOTER flag set (+10 bytes)
        bos.write("ID3".getBytes(ISO))
        bos.write(Array[Byte](3, 0, 0x10.toByte, 0, 0, 0, 10))
        bos.write(new Array[Byte](10))
        bos.write("3DI".getBytes(ISO)) // footer: reversed magic
        bos.write(Array[Byte](3, 0, 0x10.toByte, 0, 0, 0, 10))
      }
      for (_ <- 0 until n) {
        bos.write(0xFF)
        bos.write(0xF1) // MPEG-4, layer 00, no CRC
        bos.write((1 << 6) | (srIdx << 2) | (chanCfg >> 2)) // AAC-LC
        bos.write(((chanCfg & 3) << 6) | ((frameLen >> 11) & 3))
        bos.write((frameLen >> 3) & 0xff)
        bos.write(((frameLen & 7) << 5) | 0x1f) // fullness hi
        bos.write(0xFC) // fullness lo + rdb 0 (1 raw data block)
        bos.write(new Array[Byte](payLen))
      }
      if (id % 10 == 4) { // r19 (ADVICE r18): trailing ID3v1 tag
        bos.write("TAG".getBytes(ISO))
        bos.write(new Array[Byte](125))
      }
      bos.toByteArray
  }

  /** q390: minimal ISO-BMFF movies — ftyp + moov(mvhd + one or two
    * trak/tkhd) with planted timescale/duration/dims; odd ids use the
    * v1 (64-bit) mvhd/tkhd variants, id%3==2 adds an audio-only
    * second track (0x0 dims must not displace the video track's). */
  def mp4Doc(id: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32((8 + body.length).toLong) ++ typ.getBytes(ISO) ++ body
    val v1 = id % 2 == 1
    val timescale = 1000L + (id % 3) * 500
    val durTicks = (2000L + id % 9000) * timescale / 1000 // exact ms back
    val w = 320 + (id % 16).toInt * 8; val h = 180 + (id % 9).toInt * 20
    val mvhd =
      if (!v1) box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(durTicks) ++ new Array[Byte](80))
      else box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(timescale) ++ be64(durTicks) ++ new Array[Byte](80))
    def tkhd(tw: Int, th: Int): Array[Byte] =
      if (!v1) box("tkhd", Array[Byte](0, 0, 0, 0) ++
        new Array[Byte](72) ++ be32(tw.toLong << 16) ++ be32(th.toLong << 16))
      else box("tkhd", Array[Byte](1, 0, 0, 0) ++
        new Array[Byte](84) ++ be32(tw.toLong << 16) ++ be32(th.toLong << 16))
    val traks =
      if (id % 3 == 2) box("trak", tkhd(w, h)) ++ box("trak", tkhd(0, 0))
      else box("trak", tkhd(w, h))
    val moov = box("moov", mvhd ++ traks)
    val ftyp = box("ftyp", "isom".getBytes(ISO) ++ be32(0) ++
      "isom".getBytes(ISO))
    ftyp ++ moov
  }

  /** q391: WebP headers in the three public chunk shapes — (0) VP8
    * lossy key-frame header, (1) VP8L lossless bitstream header
    * (alpha bit on odd ids), (2) VP8X extended canvas (alpha flag on
    * odd ids). Planted dims per id; payload bodies are zeros (header
    * metadata only, the engine never decodes WebP pixels). */
  def webpDoc(id: Long): Array[Byte] = {
    val w = 16 + (id % 200).toInt; val h = 12 + (id % 120).toInt
    def le24(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val alpha = id % 2 == 1
    val chunk: Array[Byte] = (id % 3).toInt match {
      case 0 =>
        val body = Array[Byte](0, 0, 0) ++ // frame tag (key frame)
          Array(0x9D.toByte, 0x01.toByte, 0x2A.toByte) ++
          Array((w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
            (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte) ++
          new Array[Byte](8)
        "VP8 ".getBytes(ISO) ++ le32(body.length.toLong) ++ body
      case 1 =>
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
          ((if (alpha) 1L else 0L) << 28)
        val body = Array(0x2F.toByte) ++ le32(bits) ++ new Array[Byte](6)
        "VP8L".getBytes(ISO) ++ le32(body.length.toLong) ++ body
      case _ =>
        val body = Array[Byte](((if (alpha) 1 else 0) << 4).toByte, 0, 0, 0) ++
          le24(w - 1) ++ le24(h - 1)
        "VP8X".getBytes(ISO) ++ le32(body.length.toLong) ++ body
    }
    val riffLen = 4 + chunk.length
    "RIFF".getBytes(ISO) ++ le32(riffLen.toLong) ++ "WEBP".getBytes(ISO) ++ chunk
  }

  /** q392: minimal AVIF/HEIC containers — ftyp (brand cycling
    * avif/heic/mif1) + meta(FullBox)/iprp/ipco with a planted-dims
    * ispe; id%3==2 adds a smaller thumbnail ispe the parser must not
    * prefer. */
  def avifDoc(id: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32((8 + body.length).toLong) ++ typ.getBytes(ISO) ++ body
    val w = 64 + (id % 300).toInt; val h = 48 + (id % 200).toInt
    val brand = Seq("avif", "heic", "mif1")((id % 3).toInt)
    def ispe(iw: Int, ih: Int): Array[Byte] =
      box("ispe", Array[Byte](0, 0, 0, 0) ++ be32(iw.toLong) ++ be32(ih.toLong))
    val ipco = box("ipco",
      ispe(w, h) ++ (if (id % 3 == 2) ispe(w / 4, h / 4) else Array.emptyByteArray))
    val meta = box("meta", Array[Byte](0, 0, 0, 0) ++ box("iprp", ipco))
    val ftyp = box("ftyp", brand.getBytes(ISO) ++ be32(0) ++ brand.getBytes(ISO))
    ftyp ++ meta
  }

  /** q393: a real EPUB (OCF container.xml -> OPF manifest+spine ->
    * XHTML chapters) with planted per-chapter word counts, zipped
    * through the JDK. */
  def epubDoc(id: Long): Array[Byte] = {
    val pcount = 1 + (id % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("mimetype", "application/epub+zip")
    entry("META-INF/container.xml",
      """<?xml version="1.0"?><container version="1.0"><rootfiles>""" +
        """<rootfile full-path="OEBPS/content.opf" """ +
        """media-type="application/oebps-package+xml"/>""" +
        "</rootfiles></container>")
    val manifest = (0 until pcount).map(c =>
      s"""<item id="ch$c" href="ch$c.xhtml" """ +
        """media-type="application/xhtml+xml"/>""").mkString
    val spine = (0 until pcount).map(c =>
      s"""<itemref idref="ch$c"/>""").mkString
    entry("OEBPS/content.opf",
      s"""<?xml version="1.0"?><package version="3.0">""" +
        s"""<manifest>$manifest</manifest><spine>$spine</spine></package>""")
    for (c <- 0 until pcount) {
      val wc = 2 + ((id + c) % 7).toInt
      val words = Seq.fill(wc)("w").mkString(" ")
      entry(s"OEBPS/ch$c.xhtml",
        s"""<html><body><p>$words</p></body></html>""")
    }
    zos.close()
    bos.toByteArray
  }

  /** q394: a CBZ — a ZIP of real PNGs with planted dims and uniform
    * colors, one page per image. */
  def cbzDoc(id: Long): Array[Byte] = {
    val n = 1 + (id % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    for (g <- 0 until n) {
      val w = 6 + ((id + g) % 10).toInt; val h = 5 + ((id + g) % 7).toInt
      val (r, gg, b) = (((id * 3 + g * 7) % 256).toInt,
        ((id * 5 + g * 11) % 256).toInt, ((id * 7 + g * 13) % 256).toInt)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = img.createGraphics()
      try { gr.setColor(new java.awt.Color(r, gg, b)); gr.fillRect(0, 0, w, h) }
      finally gr.dispose()
      val ib = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", ib)
      zos.putNextEntry(new java.util.zip.ZipEntry(f"p$g%03d.png"))
      zos.write(ib.toByteArray)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** q395: a real XPS (OPC package: _rels/.rels fixedrepresentation
    * rel -> FixedDocumentSequence -> FixedDocument -> FixedPage parts
    * whose Glyphs UnicodeString carries the text) with planted
    * per-page word counts; odd ids split a page's words across two
    * Glyphs runs and use the OpenXPS rel namespace. */
  def xpsDoc(id: Long): Array[Byte] = {
    val pcount = 1 + (id % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val ns = if (id % 2 == 1)
      "http://schemas.openxps.org/oxps/v1.0/fixedrepresentation"
    else "http://schemas.microsoft.com/xps/2005/06/fixedrepresentation"
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types/>""")
    entry("_rels/.rels",
      s"""<?xml version="1.0"?><Relationships>""" +
        s"""<Relationship Type="$ns" Target="/FixedDocSeq.fdseq" Id="r1"/>""" +
        "</Relationships>")
    entry("FixedDocSeq.fdseq",
      """<?xml version="1.0"?><FixedDocumentSequence>""" +
        """<DocumentReference Source="/Documents/1/FixedDocument.fdoc"/>""" +
        "</FixedDocumentSequence>")
    val pageRefs = (0 until pcount).map(g =>
      s"""<PageContent Source="Pages/$g.fpage"/>""").mkString
    entry("Documents/1/FixedDocument.fdoc",
      s"""<?xml version="1.0"?><FixedDocument>$pageRefs</FixedDocument>""")
    for (g <- 0 until pcount) {
      val wc = 2 + ((id + g) % 7).toInt
      val glyphs =
        if (id % 2 == 1 && wc >= 2) {
          val a = Seq.fill(wc - 1)("w").mkString(" ")
          s"""<Glyphs OriginX="0" UnicodeString="$a"/>""" +
            """<Glyphs OriginX="9" UnicodeString="w"/>"""
        } else {
          val a = Seq.fill(wc)("w").mkString(" ")
          s"""<Glyphs OriginX="0" UnicodeString="$a"/>"""
        }
      entry(s"Documents/1/Pages/$g.fpage",
        s"""<?xml version="1.0"?><FixedPage Width="816" Height="1056">""" +
          s"$glyphs</FixedPage>")
    }
    zos.close()
    bos.toByteArray
  }

  /** q396: an FB2 FictionBook document with planted per-section word
    * counts; odd ids nest a subsection inside each section (the
    * depth-scan must keep nested words on the parent page). */
  def fb2Doc(id: Long): Array[Byte] = {
    val pcount = 1 + (id % 3).toInt
    val sections = (0 until pcount).map { g =>
      val wc = 2 + ((id + g) % 7).toInt
      if (id % 2 == 1 && wc >= 4) {
        val outer = Seq.fill(wc - 2)("w").mkString(" ")
        s"<section><p>$outer</p><section><p>w w</p></section></section>"
      } else {
        val words = Seq.fill(wc)("w").mkString(" ")
        s"<section><p>$words</p></section>"
      }
    }.mkString
    val xml =
      s"""<?xml version="1.0" encoding="utf-8"?>""" +
        """<FictionBook xmlns="http://www.gribuser.ru/xml/fictionbook/2.0">""" +
        """<description><title-info/></description>""" +
        s"<body>$sections</body></FictionBook>"
    xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** q403: an SVG document with a planted word count (r19 — VERDICT
    * r18 Missing #1: PyMuPDF opens `.svg` as a one-page document).
    * Even ids: a plain `<svg>` root with one `<text>` element. Odd
    * ids: an XML prologue (decl + comment + DOCTYPE), a namespace
    * prefix on the root, the words split across TWO `<text>` elements
    * with a nested `<tspan>` run and an XML entity — the root-element
    * walk, tag strip, and unescape all sit on the hash path. */
  def svgDoc(id: Long): Array[Byte] = {
    val wc = 2 + (id % 7).toInt
    val xml =
      if (id % 2 == 0) {
        val words = Seq.fill(wc)("w").mkString(" ")
        s"""<svg xmlns="http://www.w3.org/2000/svg" width="10" height="10">""" +
          s"""<rect x="0" y="0" width="5" height="5"/>""" +
          s"""<text x="1" y="9">$words</text></svg>"""
      } else {
        val a = Seq.fill(wc - 1)("w").mkString(" ")
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          "<!-- prologue comment with <text>decoy</text> inside -->" +
          """<!DOCTYPE svg PUBLIC "-//W3C//DTD SVG 1.1//EN" "svg11.dtd">""" +
          """<svg:svg xmlns:svg="http://www.w3.org/2000/svg">""" +
          s"""<svg:text x="0" y="5"><svg:tspan dy="1">$a</svg:tspan></svg:text>""" +
          """<svg:text y="9">w&#x20;</svg:text></svg:svg>"""
      }
    xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** q404: a plain-text payload with planted per-page word counts
    * under the deterministic 66-lines-per-page contract (r19): page g
    * opens with its planted words, the remaining lines are empty, and
    * the LAST page has exactly one line — so the page count is pinned
    * from both sides. Odd ids use CRLF endings and a trailing
    * terminator (which must not open an extra page). */
  def txtDoc(id: Long): Array[Byte] = {
    val pcount = 1 + (id % 3).toInt
    val lines = (0 until pcount).flatMap { g =>
      val wc = 2 + ((id + g) % 7).toInt
      val first = Seq.fill(wc)("w").mkString(" ")
      if (g == pcount - 1) Seq(first)
      else first +: Seq.fill(65)("")
    }
    val sep = if (id % 2 == 1) "\r\n" else "\n"
    val tail = if (id % 2 == 1) sep else ""
    (lines.mkString(sep) + tail)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** q397: a PDB/MOBI book with planted per-page word counts
    * (pages separated by the public mbp:pagebreak marker). Cycles the
    * envelope: id%3==0 plain BOOK/MOBI, ==1 BOOK/MOBI with a MOBI
    * header carrying extra-data flags 0x3 (one varint trailer + the
    * multibyte trailer per record, which the decoder must strip),
    * ==2 bare PalmDOC (TEXt/REAd). Even ids PalmDOC-compressed,
    * odd ids stored. Records are split small (37 bytes) so multi-
    * record concatenation is exercised at every id. */
  def mobiDoc(id: Long): Array[Byte] = {
    val pcount = 1 + (id % 3).toInt
    val compression = if (id % 2 == 0) 2 else 1
    val withExtra = id % 3 == 1
    val palmdoc = id % 3 == 2
    // the withExtra leg declares CP1252 in the MOBI codec field and
    // plants a real high byte (é = 0xE9) inside each word — a blind
    // UTF-8 decode garbles it to U+FFFD (ADVICE r18); the short-header
    // leg declares UTF-8; bare PalmDOC has no field (CP1252 default)
    val word = if (withExtra) "wé" else "w"
    val pages = (0 until pcount).map { g =>
      val wc = 2 + ((id + g) % 7).toInt
      "<p>" + Seq.fill(wc)(word).mkString(" ") + "</p>"
    }
    val text = pages.mkString("<mbp:pagebreak/>").getBytes(
      if (withExtra) java.nio.charset.Charset.forName("windows-1252")
      else java.nio.charset.StandardCharsets.UTF_8)
    val chunks = text.grouped(37).toSeq
    val records = chunks.map { ch =>
      val body =
        if (compression == 2) graft.sources.Ebooks.palmdocCompress(ch)
        else ch
      if (withExtra) body ++ Array[Byte](0x00, 0x00, 0x82.toByte)
      else body
    }
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // record 0: 16-byte PalmDOC header (+ MOBI header when flagged)
    val rec0 = {
      val pd = be16(compression) ++ be16(0) ++ be32(text.length.toLong) ++
        be16(records.length) ++ be16(4096) ++ be16(0) ++ be16(0)
      if (palmdoc) pd.take(16)
      else if (!withExtra) pd ++ "MOBI".getBytes(ISO) ++ be32(24) ++
        be32(0) ++ be32(65001) ++ // type, codec = UTF-8 (header off 12)
        new Array[Byte](8) // short header: no extra-flags field
      else {
        // MOBI header long enough for the +0xE2 extra-data flags
        val mobi = new Array[Byte](0xE8)
        System.arraycopy("MOBI".getBytes(ISO), 0, mobi, 0, 4)
        System.arraycopy(be32(0xE8L), 0, mobi, 4, 4)
        System.arraycopy(be32(1252L), 0, mobi, 12, 4) // codec = CP1252
        mobi(0xE2) = 0; mobi(0xE3) = 0x03 // varint trailer + multibyte
        pd ++ mobi
      }
    }
    val all = rec0 +: records
    val headerLen = 78 + 8 * all.length + 2
    val offs = all.scanLeft(headerLen)((a, r) => a + r.length).init
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(new Array[Byte](32)) // name
    bos.write(be16(0)); bos.write(be16(0)) // attributes, version
    bos.write(new Array[Byte](24)) // dates, modnum, appInfo, sortInfo
    bos.write((if (palmdoc) "TEXtREAd" else "BOOKMOBI").getBytes(ISO))
    bos.write(be32(0)); bos.write(be32(0)) // uid seed, next record list
    bos.write(be16(all.length))
    for ((off, k) <- offs.zipWithIndex) {
      bos.write(be32(off.toLong))
      bos.write(0); bos.write(be32(k.toLong).drop(1)) // attr + 3-byte uid
    }
    bos.write(be16(0)) // traditional 2-byte pad
    all.foreach(r => bos.write(r))
    bos.toByteArray
  }
}

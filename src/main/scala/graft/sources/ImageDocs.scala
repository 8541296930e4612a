package graft.sources

/** Raw IMAGE payloads as one-page documents (r19 — the remaining
  * PyMuPDF document-open envelope: fitz's `Document(stream=...)`
  * accepts bare raster files alongside PDF/XPS/EPUB/… — ref
  * `downloader.py:385` hands fitz ANY payload and `extractor.py:136`
  * yields the per-page XHTML, which for an image document is one page
  * embedding the image and no text).
  *
  * Detection is magic-byte sniffing PLUS a header-dims parse over the
  * container families fitz opens AND this engine's multimodal layer
  * understands — PNG, JPEG, GIF, BMP, TIFF, JPEG 2000 (JP2
  * signature box or raw SOC codestream, the `Jpx` gate), binary
  * Netpbm (P4/P5/P6), and PSD (r19b). The dims
  * gate mirrors fitz's open (which parses the header before any
  * pixel work): a payload whose header is torn is NOT claimed — it
  * falls through to the TXT class or the fallback's error channel
  * rather than fabricating a wordless "success" page (the engine-wide
  * dropped-never-fabricated policy; the same-round TXT fix applied
  * the identical rule to zero-byte bodies). The decoded page carries
  * no words; the image route surfaces the payload VERBATIM (the same
  * discipline as painted `/DCTDecode` XObjects — the downstream codec
  * owns pixel access, and a payload whose BODY is torn past the
  * header drops there). The binary Netpbm subtypes are claimed
  * through a FULL parse — header plus the complete-raster length
  * requirement, which is what keeps printable "P5 …" prose out; the
  * ASCII twins (P1–P3) are deliberately NOT claimed: they are
  * printable text and belong to the TXT class's strict detection. */
object ImageDocs {

  /** The one-page XHTML an image document decodes to (fitz's
    * image-document page embeds the raster and nothing else). */
  val Page = "<div><img/></div>"

  /** True when the payload opens as a raster document: recognized
    * magic AND a parseable header with nonzero dims. */
  def isImage(p: Array[Byte]): Boolean = headerDims(p).isDefined

  @inline private def be16(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
  @inline private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  @inline private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
  @inline private def le32(p: Array[Byte], o: Int): Long =
    (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

  private def dims(w: Long, h: Long): Option[(Int, Int)] =
    if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some((w.toInt, h.toInt))
    else None

  /** Header-parsed (width, height), or None when the payload is not
    * a recognized raster or its header is torn. */
  def headerDims(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null || p.length < 12) return None
    @inline def u(i: Int): Int = p(i) & 0xff
    // PNG: signature + the mandatory first IHDR chunk (w/h BE at 16/20)
    if (u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
        u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a) {
      if (p.length < 24 || be32(p, 8) != 13 ||
          !(u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'))
        return None
      return dims(be32(p, 16), be32(p, 20))
    }
    // JPEG: marker walk to the first SOFn (the jpegComponents shape)
    if (u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) {
      var q = 2
      while (q + 4 <= p.length) {
        if (u(q) != 0xFF) return None
        val m = u(q + 1)
        if (m == 0xFF) q += 1 // fill byte
        else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS, no SOF
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) q += 2
        else {
          val len = be16(p, q + 2)
          if (len < 2 || q + 2 + len > p.length) return None
          val isSof = (m >= 0xC0 && m <= 0xCF) && m != 0xC4 &&
            m != 0xC8 && m != 0xCC
          if (isSof) {
            if (q + 9 > p.length) return None
            return dims(be16(p, q + 7).toLong, be16(p, q + 5).toLong)
          }
          q += 2 + len
        }
      }
      return None
    }
    // GIF87a/GIF89a: logical screen descriptor dims (LE at 6/8)
    if (u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
        (u(4) == '7' || u(4) == '9') && u(5) == 'a')
      return dims(le16(p, 6).toLong, le16(p, 8).toLong)
    // BMP: "BM" + zero RESERVED bytes (6-9 — never zero in printable
    // text, so "BMW…" stays a document) + the DIB header's dims
    if (u(0) == 'B' && u(1) == 'M' && p.length >= 26 &&
        (u(6) | u(7) | u(8) | u(9)) == 0) {
      val dib = le32(p, 14)
      if (dib == 12) // BITMAPCOREHEADER: 16-bit dims
        return dims(le16(p, 18).toLong, le16(p, 20).toLong)
      if (dib >= 40 && p.length >= 14 + 24) // BITMAPINFOHEADER family
        // height may be negative (top-down rows) — magnitude is the dim
        return dims(le32(p, 18), math.abs(le32(p, 22).toInt).toLong)
      return None
    }
    // TIFF: endian magic, first IFD walk for tags 256/257 (SHORT/LONG
    // values inline in the 12-byte entry)
    val tiffLe = u(0) == 'I' && u(1) == 'I' && u(2) == 0x2a && u(3) == 0
    val tiffBe = u(0) == 'M' && u(1) == 'M' && u(2) == 0 && u(3) == 0x2a
    if (tiffLe || tiffBe) {
      @inline def r16(o: Int): Int = if (tiffLe) le16(p, o) else be16(p, o)
      @inline def r32(o: Int): Long = if (tiffLe) le32(p, o) else be32(p, o)
      val ifd = r32(4)
      if (ifd < 8 || ifd + 2 > p.length) return None
      val n = r16(ifd.toInt)
      if (n <= 0 || ifd + 2 + 12L * n > p.length) return None
      var w = -1L; var h = -1L
      var i = 0
      while (i < n) {
        val e = ifd.toInt + 2 + 12 * i
        val tag = r16(e); val typ = r16(e + 2); val cnt = r32(e + 4)
        if ((tag == 256 || tag == 257) && cnt == 1 &&
            (typ == 3 || typ == 4)) {
          // SHORT values occupy the value field's FIRST two bytes
          val v = if (typ == 3) r16(e + 8).toLong else r32(e + 8)
          if (tag == 256) w = v else h = v
        }
        i += 1
      }
      return if (w > 0 && h > 0) dims(w, h) else None
    }
    // JPEG 2000: the Jpx gate + its SIZ dims parse
    if (Jpx.isJpx(p))
      return Jpx.sizDims(p).flatMap { case (w, h, _) => dims(w.toLong, h.toLong) }
    // binary Netpbm: FULL parse incl. the complete-raster length
    // requirement (see pnmMeta — what keeps "P5 …" prose out)
    if (u(0) == 'P' && p(1) >= '4' && p(1) <= '6')
      return pnmMeta(p).map { case (w, h, _, _) => (w, h) }
    // PSD: "8BPS" + the validated 26-byte header
    if (u(0) == '8' && u(1) == 'B' && u(2) == 'P' && u(3) == 'S')
      return psdDims(p).map { case (w, h, _) => (w, h) }
    None
  }

  /** Binary Netpbm (P4/P5/P6) FULL parse (r19 — the Netpbm raster
    * family fitz opens; BINARY subtypes only: the ASCII twins P1–P3
    * are printable text and belong to the TXT class's strict
    * detection). Header: magic, whitespace-separated decimal tokens
    * with `#`-to-EOL comments — width, height, maxval (P5/P6,
    * ≤ 65535; 2-byte big-endian samples past 255) — then ONE
    * whitespace byte and the raster. The COMPLETE raster must be
    * present (`ceil(w/8)·h` bytes for P4 — MSB-first, 1 = BLACK per
    * the format — `w·h·bytesPer` for P5, `3·w·h·bytesPer` for P6);
    * the length requirement is also what makes a false claim on
    * printable "P5 …" prose practically impossible. Samples scale to
    * 0–255 (`v·255/maxval` — exact for the common maxval 255);
    * luminance is the engine-wide 0.299/0.587/0.114 mean. Returns
    * (width, height, meanLum, channels). */
  def pnmMeta(p: Array[Byte]): Option[(Int, Int, Double, Int)] = {
    if (p == null || p.length < 8 || p(0) != 'P') return None
    val kind = p(1) - '0'
    if (kind < 4 || kind > 6) return None
    var o = 2
    def skipWs(): Boolean = {
      val start = o
      var done = false
      while (!done && o < p.length) {
        val c = p(o) & 0xff
        if (c == '#') { while (o < p.length && p(o) != '\n') o += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
                 c == '\f' || c == 0x0b) o += 1
        else done = true
      }
      o > start
    }
    def token(): Int = { // -1 = parse failure
      if (!skipWs()) return -1
      var v = 0L; var any = false
      while (o < p.length && p(o) >= '0' && p(o) <= '9') {
        v = v * 10 + (p(o) - '0'); any = true
        if (v > 1000000L) return -1
        o += 1
      }
      if (any) v.toInt else -1
    }
    val w = token(); if (w < 1) return None
    val h = token(); if (h < 1) return None
    if (w.toLong * h > 16777216L) return None
    val maxv = if (kind == 4) 1 else token()
    if (maxv < 1 || maxv > 65535) return None
    // exactly ONE whitespace byte separates the header from the raster
    if (o >= p.length) return None
    val sep = p(o) & 0xff
    if (!(sep == ' ' || sep == '\t' || sep == '\r' || sep == '\n')) return None
    o += 1
    var sum = 0.0
    if (kind == 4) {
      val rowBytes = (w + 7) / 8
      if (o + rowBytes.toLong * h > p.length) return None
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bit = (p(o + y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
          val v = if (bit == 1) 0.0 else 255.0 // PBM: 1 = BLACK
          sum += 0.299 * v + 0.587 * v + 0.114 * v
          x += 1
        }
        y += 1
      }
      Some((w, h, sum / (w.toLong * h), 1))
    } else {
      val bytesPer = if (maxv > 255) 2 else 1
      val samplesPerPx = if (kind == 6) 3 else 1
      val need = w.toLong * h * samplesPerPx * bytesPer
      if (o + need > p.length) return None
      @inline def sample(i: Long): Double = {
        val b = o + i * bytesPer
        val raw = if (bytesPer == 2)
          ((p(b.toInt) & 0xff) << 8) | (p(b.toInt + 1) & 0xff)
        else p(b.toInt) & 0xff
        if (raw > maxv) return -1.0 // over-maxval sample: torn/hostile
        raw * 255.0 / maxv
      }
      var i = 0L
      val n = w.toLong * h
      while (i < n) {
        if (kind == 6) {
          val r = sample(i * 3); val g = sample(i * 3 + 1)
          val b = sample(i * 3 + 2)
          if (r < 0 || g < 0 || b < 0) return None
          sum += 0.299 * r + 0.587 * g + 0.114 * b
        } else {
          val v = sample(i)
          if (v < 0) return None
          sum += 0.299 * v + 0.587 * v + 0.114 * v
        }
        i += 1
      }
      Some((w, h, sum / n, samplesPerPx))
    }
  }

  /** PSD header dims (r19 — fitz opens Photoshop documents; the JDK
    * ships no PSD codec, so this is the Jpx discipline: header-only
    * dims, luminance ABSENT, never fabricated). Public layout:
    * "8BPS", version 1, six RESERVED zero bytes, channel count
    * 1..56, height then width as big-endian 32-bit (1..30000 per the
    * PSD limit), depth 1/8/16/32. Returns (width, height, channels);
    * torn or out-of-envelope headers → None. */
  def psdDims(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p == null || p.length < 26) return None
    @inline def u(i: Int): Int = p(i) & 0xff
    if (!(u(0) == '8' && u(1) == 'B' && u(2) == 'P' && u(3) == 'S'))
      return None
    if (((u(4) << 8) | u(5)) != 1) return None // version 1 = PSD
    if ((u(6) | u(7) | u(8) | u(9) | u(10) | u(11)) != 0) return None
    val ch = (u(12) << 8) | u(13)
    val h = be32(p, 14); val w = be32(p, 18)
    val depth = (u(22) << 8) | u(23)
    if (ch < 1 || ch > 56 || w < 1 || h < 1 || w > 30000 || h > 30000 ||
        !(depth == 1 || depth == 8 || depth == 16 || depth == 32))
      return None
    Some((w.toInt, h.toInt, ch))
  }

  /** The one-page decode: the page text (no words) plus, on the
    * image route, the payload itself — verbatim, never re-encoded. */
  def pages(p: Array[Byte], withImages: Boolean)
      : Seq[(String, Seq[Array[Byte]])] =
    Seq((Page, if (withImages) Seq(p) else Seq.empty))
}

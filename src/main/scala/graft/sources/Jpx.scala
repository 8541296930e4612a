package graft.sources

/** JPEG 2000 (`/JPXDecode`) payload surfacing — the digitized-archive
  * class (r17, VERDICT r16 Missing #1: JSTOR/newspaper-scan/national-
  * library corpora carry JPX rasters; reference `extractor.py:136`
  * rides PyMuPDF, which surfaces every raster). A full wavelet decoder
  * is out of proportion for this engine; like the DCT case, a
  * `/JPXDecode` stream IS a complete, self-describing container —
  * either a JP2 file (ISO/IEC 15444-1 Annex I box structure) or a raw
  * JPEG 2000 codestream (Annex A) — so the engine surfaces it VERBATIM
  * and parses dimensions from the public SIZ marker segment
  * (ISO/IEC 15444-1 A.5.1), letting feature extraction report dims
  * without luminance rather than dropping the payload.
  *
  * Everything here implements the PUBLIC ISO/IEC 15444-1 layout:
  * the JP2 signature box (I.5.1), the box walk to the contiguous-
  * codestream (`jp2c`) box (I.5.4), and the SOC+SIZ marker pair that
  * must open every codestream (A.4.1/A.5.1). Defensive end to end —
  * any structural violation yields None, never fabricated dims. */
object Jpx {

  /** JP2 signature box: length 12, type 'jP  ', content
    * 0x0D0A870A (ISO/IEC 15444-1 I.5.1). */
  private val Jp2Sig: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x0C, 0x6A, 0x50, 0x20, 0x20,
    0x0D, 0x0A, 0x87, 0x0A).map(_.toByte)

  @inline private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  @inline private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** True when the payload opens with the JP2 signature box or a raw
    * codestream's SOC marker (the two shapes §7.4.9 permits in a
    * `/JPXDecode` stream). */
  def isJpx(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      (b.startsWith(Jp2Sig) ||
        ((b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0x4F))

  /** Offset of the contiguous codestream: 0 for a raw codestream;
    * for a JP2 container, the payload of the first `jp2c` box found
    * by a defensive box walk (u32 length + 4CC type; LBox 0 = to EOF,
    * LBox 1 = 8-byte XLBox). None when the walk tears. */
  private def codestreamAt(b: Array[Byte]): Option[Int] = {
    if (b.length >= 2 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0x4F)
      return Some(0)
    if (!b.startsWith(Jp2Sig)) return None
    var p = Jp2Sig.length
    var boxes = 0
    while (p + 8 <= b.length) {
      boxes += 1
      if (boxes > 64) return None // hostile box chain
      val lbox = u32(b, p)
      val tJp2c = (b(p + 4) & 0xff) == 'j' && (b(p + 5) & 0xff) == 'p' &&
        (b(p + 6) & 0xff) == '2' && (b(p + 7) & 0xff) == 'c'
      val (payloadAt, next) =
        if (lbox == 1) {
          if (p + 16 > b.length) return None
          val xl = (u32(b, p + 8) << 32) | u32(b, p + 12)
          if (xl < 16 || p + xl > b.length) return None
          (p + 16, p + xl.toInt)
        } else if (lbox == 0) (p + 8, b.length) // box extends to EOF
        else {
          if (lbox < 8 || p + lbox > b.length) return None
          (p + 8, p + lbox.toInt)
        }
      if (tJp2c) return Some(payloadAt)
      if (next <= p) return None
      p = next
    }
    None
  }

  /** Parse (width, height, components) from the codestream's SIZ
    * marker segment (ISO/IEC 15444-1 A.5.1): SOC (FF4F) must be the
    * first marker and SIZ (FF51) the second; image dims are
    * Xsiz−XOsiz × Ysiz−YOsiz. None on any structural violation or
    * absurd dims (same 16 Mpx cap as the raster legs). */
  def sizDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val cs = codestreamAt(b).getOrElse(return None)
    // SOC, then SIZ immediately (A.4.1: SIZ is required right after SOC)
    if (cs + 42 > b.length) return None
    if ((b(cs) & 0xff) != 0xFF || (b(cs + 1) & 0xff) != 0x4F) return None
    if ((b(cs + 2) & 0xff) != 0xFF || (b(cs + 3) & 0xff) != 0x51) return None
    val m = cs + 2 // SIZ marker offset
    val lsiz = u16(b, m + 2)
    val xsiz = u32(b, m + 6); val ysiz = u32(b, m + 10)
    val xo = u32(b, m + 14); val yo = u32(b, m + 18)
    val csiz = u16(b, m + 38)
    if (lsiz != 38 + 3 * csiz) return None // A.5.1 length law
    if (m + 2 + lsiz > b.length) return None
    if (csiz < 1 || csiz > 16384) return None
    val w = xsiz - xo; val h = ysiz - yo
    // bound each side BEFORE the product: hostile u32 dims (4G×4G)
    // overflow the Long product past the cap and would wrap .toInt
    if (w <= 0 || h <= 0 || w > 16777216L || h > 16777216L ||
        w * h > 16777216L) return None
    Some((w.toInt, h.toInt, csiz))
  }
}

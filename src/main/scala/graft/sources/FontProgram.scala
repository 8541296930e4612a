package graft.sources

/** Embedded-font-program text decode for PDFs whose fonts carry neither a
  * `/ToUnicode` CMap nor a standard `/Encoding` — the pdftex/Type1 and
  * subset-TrueType-with-symbolic-cmap class common in pre-2010 LaTeX
  * papers. PyMuPDF extracts text from ANY font by reading the embedded
  * font program (reference behavior: `doc2dataset/extractor.py:136` rides
  * `page.get_text("xhtml")`, which consults the font's `cmap`/`post`
  * tables through MuPDF); without this, such glyph codes fall back to
  * byte identity and yield garbage for non-ASCII-mapped codes.
  *
  * Two public font formats are parsed, both from their open specs:
  *
  *  - '''TrueType/OpenType sfnt''' (`/FontFile2`, Apple TrueType
  *    Reference + Microsoft OpenType spec): the table directory, `cmap`
  *    subtable formats 0/4/6 over the (3,0) Symbol, (1,0) Macintosh and
  *    (3,1)/(0,x)/(3,10) Unicode platform slots, and the `post` table
  *    (format 2.0) glyph names. A simple font's code resolves
  *    code→glyph through the symbol table (`0xF0xx` convention first),
  *    then Mac, then Unicode-as-identity; the glyph resolves
  *    glyph→Unicode through an INVERTED Unicode cmap (direct evidence)
  *    or the `post` glyph name via the Adobe Glyph List conventions.
  *  - '''Type 1''' (`/FontFile`, Adobe Type 1 Font Format book): the
  *    cleartext (pre-`eexec`) `/Encoding` array's `dup <code> /<name>
  *    put` entries, names mapped through the same AGL conventions.
  *
  * Everything here is defensive: any structural violation (truncated
  * table, offset out of bounds, absurd counts) aborts to an EMPTY map —
  * the caller's byte-identity fallback must survive arbitrary bytes, a
  * crawled-PDF invariant shared with the rest of MiniPdf.
  */
object FontProgram {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Offset of a top-level sfnt table by tag, bounds-checked. Handles a
    * TrueType-Collection header by descending into the first font. */
  private def tableOffset(b: Array[Byte], tag: String): Option[Int] = {
    if (b.length < 12) return None
    var base = 0
    if (b(0) == 't' && b(1) == 't' && b(2) == 'c' && b(3) == 'f') {
      if (b.length < 16 || u32(b, 8) < 1) return None
      val first = u32(b, 12)
      if (first < 0 || first + 12 > b.length) return None
      base = first.toInt
    }
    val numTables = u16(b, base + 4)
    if (numTables > 512 || base + 12 + 16 * numTables > b.length) return None
    var k = 0
    while (k < numTables) {
      val rec = base + 12 + 16 * k
      if (b(rec) == tag(0) && b(rec + 1) == tag(1) &&
          b(rec + 2) == tag(2) && b(rec + 3) == tag(3)) {
        val off = u32(b, rec + 8)
        val len = u32(b, rec + 12)
        return if (off >= 0 && len >= 0 && off + len <= b.length && len >= 4)
          Some(off.toInt)
        else None
      }
      k += 1
    }
    None
  }

  /** One parsed cmap subtable: point lookup + bounded enumeration (for
    * inversion). Enumeration is capped so a hostile format-4 segment
    * span cannot allocate the full 21-bit plane. */
  private final class CmapSub(b: Array[Byte], off: Int) {
    val format: Int = if (off + 2 <= b.length) u16(b, off) else -1

    def lookup(c: Int): Int = format match {
      case 0 =>
        if (c < 0 || c > 255 || off + 6 + 256 > b.length) 0
        else u8(b, off + 6 + c)
      case 4 =>
        if (off + 14 > b.length) return 0
        val segX2 = u16(b, off + 6)
        if (segX2 < 2 || (segX2 & 1) == 1) return 0
        val endAt = off + 14
        val startAt = endAt + segX2 + 2
        val deltaAt = startAt + segX2
        val rangeAt = deltaAt + segX2
        if (rangeAt + segX2 > b.length) return 0
        var lo = 0; var hi = segX2 / 2 - 1; var seg = -1
        while (lo <= hi) { // first segment with endCode >= c
          val mid = (lo + hi) >>> 1
          if (u16(b, endAt + 2 * mid) >= c) { seg = mid; hi = mid - 1 }
          else lo = mid + 1
        }
        if (seg < 0) return 0
        val start = u16(b, startAt + 2 * seg)
        if (c < start) return 0
        val delta = u16(b, deltaAt + 2 * seg)
        val iro = u16(b, rangeAt + 2 * seg)
        if (iro == 0) (c + delta) & 0xffff
        else {
          val at = rangeAt + 2 * seg + iro + 2 * (c - start)
          if (at + 2 > b.length) 0
          else {
            val g = u16(b, at)
            if (g == 0) 0 else (g + delta) & 0xffff
          }
        }
      case 6 =>
        if (off + 10 > b.length) return 0
        val first = u16(b, off + 6)
        val count = u16(b, off + 8)
        if (c < first || c >= first + count || off + 10 + 2 * count > b.length) 0
        else u16(b, off + 10 + 2 * (c - first))
      case _ => 0
    }

    /** Visit (code, glyph) pairs, at most `cap` of them. */
    def foreachMapping(cap: Int)(f: (Int, Int) => Unit): Unit = format match {
      case 0 =>
        if (off + 6 + 256 <= b.length) {
          var c = 0
          while (c < 256) { val g = u8(b, off + 6 + c); if (g != 0) f(c, g); c += 1 }
        }
      case 4 =>
        if (off + 14 <= b.length) {
          val segX2 = u16(b, off + 6)
          if (segX2 >= 2 && (segX2 & 1) == 0 &&
              off + 16 + 4 * segX2 <= b.length) {
            var seg = 0; var seen = 0
            while (seg < segX2 / 2 && seen < cap) {
              val end = u16(b, off + 14 + 2 * seg)
              val start = u16(b, off + 16 + segX2 + 2 * seg)
              var c = start
              while (c <= end && c != 0xFFFF && seen < cap) {
                val g = lookup(c)
                if (g != 0) { f(c, g); seen += 1 }
                c += 1
              }
              seg += 1
            }
          }
        }
      case 6 =>
        if (off + 10 <= b.length) {
          val first = u16(b, off + 6)
          val count = math.min(u16(b, off + 8), cap)
          if (off + 10 + 2 * count <= b.length) {
            var k = 0
            while (k < count) {
              val g = u16(b, off + 10 + 2 * k)
              if (g != 0) f(first + k, g)
              k += 1
            }
          }
        }
      case _ =>
    }
  }

  /** cmap subtables by platform slot: (3,0) symbol, (1,0) mac, first
    * Unicode-semantics slot ((3,1), (0,any), (3,10)). */
  private def cmapSubtables(b: Array[Byte])
      : (Option[CmapSub], Option[CmapSub], Option[CmapSub]) = {
    val cm = tableOffset(b, "cmap").getOrElse(return (None, None, None))
    if (cm + 4 > b.length) return (None, None, None)
    val n = u16(b, cm + 2)
    if (n > 64 || cm + 4 + 8 * n > b.length) return (None, None, None)
    var symbol: Option[CmapSub] = None
    var mac: Option[CmapSub] = None
    var uni: Option[CmapSub] = None
    var k = 0
    while (k < n) {
      val rec = cm + 4 + 8 * k
      val plat = u16(b, rec); val enc = u16(b, rec + 2)
      val sub = cm + u32(b, rec + 4)
      if (sub >= 0 && sub + 4 <= b.length) {
        val t = new CmapSub(b, sub.toInt)
        if (t.format == 0 || t.format == 4 || t.format == 6) {
          if (plat == 3 && enc == 0 && symbol.isEmpty) symbol = Some(t)
          else if (plat == 1 && enc == 0 && mac.isEmpty) mac = Some(t)
          else if (((plat == 3 && (enc == 1 || enc == 10)) || plat == 0) &&
                   uni.isEmpty) uni = Some(t)
        }
      }
      k += 1
    }
    (symbol, mac, uni)
  }

  /** Inverted Unicode cmap: glyph → FIRST Unicode code mapping to it. */
  private def invertedUnicode(uni: Option[CmapSub]): Map[Int, Int] = {
    val out = scala.collection.mutable.Map[Int, Int]()
    uni.foreach(_.foreachMapping(65536) { (c, g) =>
      if (!out.contains(g)) out(g) = c
    })
    out.toMap
  }

  /** `post`-format-2.0 glyph names: glyph id → name. Indices < 258 hit
    * the standard Macintosh order (Apple TrueType Reference Manual,
    * `post` chapter — a public constant); ≥ 258 hit the font's own
    * Pascal-string array. */
  private def postGlyphNames(b: Array[Byte]): Map[Int, String] = {
    val off = tableOffset(b, "post").getOrElse(return Map.empty)
    if (off + 34 > b.length || u32(b, off) != 0x00020000L) return Map.empty
    val numGlyphs = u16(b, off + 32)
    if (numGlyphs > 65535 || off + 34 + 2 * numGlyphs > b.length) return Map.empty
    val idx = Array.tabulate(numGlyphs)(g => u16(b, off + 34 + 2 * g))
    val custom = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = off + 34 + 2 * numGlyphs
    while (p < b.length && custom.length < numGlyphs) {
      val len = u8(b, p)
      if (p + 1 + len > b.length) return Map.empty
      custom += new String(b, p + 1, len, java.nio.charset.StandardCharsets.ISO_8859_1)
      p += 1 + len
    }
    (0 until numGlyphs).flatMap { g =>
      val i = idx(g)
      if (i < 258) Some(g -> MacGlyphNames(i))
      else if (i - 258 < custom.length) Some(g -> custom(i - 258))
      else None
    }.toMap
  }

  /** Glyph → Unicode string via the `post` name (AGL conventions) or an
    * inverted Unicode cmap; drops .notdef and control characters. */
  private def glyphToUnicode(b: Array[Byte], uni: Option[CmapSub])
      : Int => Option[String] = {
    val inv = invertedUnicode(uni)
    val names = postGlyphNames(b)
    (g: Int) =>
      if (g <= 0) None
      else {
        val byUni = inv.get(g).collect {
          case c if c >= 0x20 || c == '\t' || c == '\n' =>
            new String(Character.toChars(c))
        }
        byUni.orElse(names.get(g).flatMap(MiniPdf.glyphUnicode))
          .filter(s => s.nonEmpty && (s.charAt(0) >= 0x20 ||
            s.charAt(0) == '\t' || s.charAt(0) == '\n'))
      }
  }

  /** Simple-font byte code → Unicode from an embedded TrueType program
    * (ISO 32000-1 §9.6.6.4's lookup order, collapsed for extraction):
    * code→glyph through (3,0) symbol (`0xF000|code` first, the Windows
    * Symbol convention, then the raw code), else (1,0) Mac, else the
    * Unicode table with the code AS its Latin-1 code point; glyph→
    * Unicode per [[glyphToUnicode]]. Unmapped codes are ABSENT (the
    * caller's byte-identity fallback applies, never glyph-id garbage). */
  def trueTypeSimpleMap(sfnt: Array[Byte]): Map[Int, String] =
    try {
      val (symbol, mac, uni) = cmapSubtables(sfnt)
      if (symbol.isEmpty && mac.isEmpty && uni.isEmpty) return Map.empty
      val toUni = glyphToUnicode(sfnt, uni)
      (0 to 255).flatMap { c =>
        var g = symbol.map(t => {
          val hi = t.lookup(0xF000 | c); if (hi != 0) hi else t.lookup(c)
        }).getOrElse(0)
        if (g == 0) g = mac.map(_.lookup(c)).getOrElse(0)
        if (g == 0) g = uni.map(_.lookup(c)).getOrElse(0)
        toUni(g).map(c -> _)
      }.toMap
    } catch { case _: RuntimeException => Map.empty }

  /** Glyph id → Unicode for a CID font whose codes ARE glyph ids
    * (`/Identity-H` + default `/CIDToGIDMap /Identity`, the dominant
    * subset-font shape) and that has no `/ToUnicode`. */
  def trueTypeGidMap(sfnt: Array[Byte]): Map[Int, String] =
    try {
      val (_, _, uni) = cmapSubtables(sfnt)
      val names = postGlyphNames(sfnt)
      val toUni = glyphToUnicode(sfnt, uni)
      val gids = scala.collection.mutable.Set[Int]()
      uni.foreach(_.foreachMapping(65536)((_, g) => gids += g))
      gids ++= names.keysIterator
      gids.iterator.flatMap(g => toUni(g).map(g -> _)).toMap
    } catch { case _: RuntimeException => Map.empty }

  /** Type 1 cleartext `/Encoding` (Adobe Type 1 Font Format §2.3): the
    * `dup <code> /<name> put` entries before `eexec`, names through the
    * AGL conventions. `StandardEncoding` (or no custom array) yields
    * EMPTY — the byte-identity fallback is ASCII-correct there and a
    * wrong guess would override correct bytes. */
  def type1EncodingMap(data: Array[Byte]): Map[Int, String] =
    try {
      val clearLen = {
        val idx = indexOfAscii(data, "eexec")
        if (idx >= 0) idx else math.min(data.length, 65536)
      }
      val txt = new String(data, 0, clearLen,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val encAt = txt.indexOf("/Encoding")
      if (encAt < 0) return Map.empty
      val Dup = """dup\s+(\d+)\s*/([^\s/\(\)\[\]{}<>]+)\s+put""".r
      Dup.findAllMatchIn(txt.substring(encAt)).flatMap { m =>
        val code = m.group(1).toInt
        if (code > 255) None
        else MiniPdf.glyphUnicode(m.group(2)).map(code -> _)
      }.toMap
    } catch { case _: RuntimeException => Map.empty }

  private def indexOfAscii(b: Array[Byte], needle: String): Int = {
    val n = needle.length
    var i = 0
    while (i + n <= b.length) {
      var k = 0
      while (k < n && b(i + k) == needle(k)) k += 1
      if (k == n) return i
      i += 1
    }
    -1
  }

  /** The 258 standard Macintosh glyph names in `post`-table order
    * (Apple TrueType Reference Manual, `post` chapter — public). */
  private[sources] val MacGlyphNames: Array[String] = (
    ".notdef .null nonmarkingreturn space exclam quotedbl numbersign " +
    "dollar percent ampersand quotesingle parenleft parenright asterisk " +
    "plus comma hyphen period slash zero one two three four five six " +
    "seven eight nine colon semicolon less equal greater question at " +
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z " +
    "bracketleft backslash bracketright asciicircum underscore grave " +
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " +
    "braceleft bar braceright asciitilde Adieresis Aring Ccedilla Eacute " +
    "Ntilde Odieresis Udieresis aacute agrave acircumflex adieresis " +
    "atilde aring ccedilla eacute egrave ecircumflex edieresis iacute " +
    "igrave icircumflex idieresis ntilde oacute ograve ocircumflex " +
    "odieresis otilde uacute ugrave ucircumflex udieresis dagger degree " +
    "cent sterling section bullet paragraph germandbls registered " +
    "copyright trademark acute dieresis notequal AE Oslash infinity " +
    "plusminus lessequal greaterequal yen mu partialdiff summation " +
    "product pi integral ordfeminine ordmasculine Omega ae oslash " +
    "questiondown exclamdown logicalnot radical florin approxequal " +
    "Delta guillemotleft guillemotright ellipsis nonbreakingspace " +
    "Agrave Atilde Otilde OE oe endash emdash quotedblleft quotedblright " +
    "quoteleft quoteright divide lozenge ydieresis Ydieresis fraction " +
    "currency guilsinglleft guilsinglright fi fl daggerdbl " +
    "periodcentered quotesinglbase quotedblbase perthousand Acircumflex " +
    "Ecircumflex Aacute Edieresis Egrave Iacute Icircumflex Idieresis " +
    "Igrave Oacute Ocircumflex apple Ograve Uacute Ucircumflex Ugrave " +
    "dotlessi circumflex tilde macron breve dotaccent ring cedilla " +
    "hungarumlaut ogonek caron Lslash lslash Scaron scaron Zcaron " +
    "zcaron brokenbar Eth eth Yacute yacute Thorn thorn minus multiply " +
    "onesuperior twosuperior threesuperior onehalf onequarter " +
    "threequarters franc Gbreve gbreve Idotaccent Scedilla scedilla " +
    "Cacute cacute Ccaron ccaron dcroat").split(' ')
  require(MacGlyphNames.length == 258)
}

package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

/** REAL (subset) PDF text decoding with zero dependencies — the
  * round-11 promotion path for the #1 "What's missing" row. The
  * reference opens documents with PyMuPDF and renders pages
  * (`/root/reference/doc2dataset/downloader.py:385`,
  * `extractor.py:128-176`); no PDF library ships in this container,
  * but the PDF 1.x primitives needed for TEXT extraction are all
  * JDK-reachable:
  *
  *   - object syntax (`N G obj … endobj`), dictionaries, streams —
  *     plain parsing (done robustness-first: objects are discovered by
  *     scanning, not via the xref table, which is exactly the
  *     "reconstruction" mode real parsers fall back to on damaged
  *     files)
  *   - `/FlateDecode` content streams — `java.util.zip.Inflater`
  *   - the page tree (`/Root → /Pages → /Kids → /Page`) for true page
  *     ORDER (document order of objects is not page order)
  *   - text operators inside `BT…ET`: `Tj`, `'`, `"`, `TJ` (with
  *     literal-string escapes incl. octal, and hex strings), `Td`/
  *     `TD`/`T*` line moves
  *
  * Honest subset limits (documented, spec-pinned): simple byte
  * encodings only (Latin-1/WinAnsi-ish — no CID/Type0 composite
  * fonts), FlateDecode only (no DCT/LZW/ASCII85 filters), no
  * encryption, kerning numbers in TJ arrays are not turned into
  * spaces. Payloads outside the subset fail CLOSED with a descriptive
  * Left, exactly like the reference's `cannot open document` channel.
  */
object MiniPdf {

  final case class PdfObj(num: Int, dict: String, stream: Option[Array[Byte]])

  private val ObjHeader = """(?s)(\d+)\s+(\d+)\s+obj""".r
  private val RootRef = """/Root\s+(\d+)\s+\d+\s+R""".r
  private val PagesRef = """/Pages\s+(\d+)\s+\d+\s+R""".r
  private val KidsArr = """(?s)/Kids\s*\[(.*?)\]""".r
  private val Ref = """(\d+)\s+\d+\s+R""".r
  private val ContentsArr = """(?s)/Contents\s*\[(.*?)\]""".r
  private val ContentsOne = """/Contents\s+(\d+)\s+\d+\s+R""".r

  /** Balanced `<< … >>` span starting at `start` (which must point at
    * `<<`); returns exclusive end index, or -1. */
  private def dictEnd(s: String, start: Int): Int = {
    var i = start
    var depth = 0
    while (i < s.length - 1) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      }
      else i += 1
    }
    -1
  }

  /** Scan all indirect objects (xref-free reconstruction mode). */
  def parseObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val s = new String(bytes, ISO_8859_1)
    val out = scala.collection.mutable.Map[Int, PdfObj]()
    for (m <- ObjHeader.findAllMatchIn(s)) {
      val num = m.group(1).toInt
      var i = m.end
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      var dict = ""
      if (i + 1 < s.length && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
        val e = dictEnd(s, i)
        if (e > 0) { dict = s.substring(i, e); i = e }
      }
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      val stream =
        if (s.startsWith("stream", i)) {
          var j = i + "stream".length
          if (j < s.length && s.charAt(j) == '\r') j += 1
          if (j < s.length && s.charAt(j) == '\n') j += 1
          val e = s.indexOf("endstream", j)
          if (e < 0) None
          else {
            var k = e
            if (k > j && s.charAt(k - 1) == '\n') k -= 1
            if (k > j && s.charAt(k - 1) == '\r') k -= 1
            Some(s.substring(j, k).getBytes(ISO_8859_1))
          }
        } else None
      // later definitions win (incremental updates append new versions)
      out(num) = PdfObj(num, dict, stream)
    }
    out.toMap
  }

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val bos = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return bos.toByteArray // truncated
      }
      bos.toByteArray
    } finally inf.end()
  }

  private def decodedStream(o: PdfObj): Array[Byte] = o.stream match {
    case Some(raw) if o.dict.contains("/FlateDecode") => inflate(raw)
    case Some(raw) => raw
    case None => Array.emptyByteArray
  }

  /** Page object numbers in page-tree order; falls back to document
    * order of `/Type /Page` objects when the tree is unwalkable. */
  def pageOrder(objs: Map[Int, PdfObj], raw: Array[Byte]): Seq[Int] = {
    val s = new String(raw, ISO_8859_1)
    def isPageLeaf(dict: String) =
      """/Type\s*/Page\b""".r.findFirstIn(dict).isDefined &&
        !"""/Type\s*/Pages\b""".r.findFirstIn(dict).isDefined
    val fromTree: Seq[Int] =
      (for {
        root <- RootRef.findAllMatchIn(s).toSeq.lastOption.map(_.group(1).toInt)
        cat <- objs.get(root)
        pagesRoot <- PagesRef.findFirstMatchIn(cat.dict).map(_.group(1).toInt)
      } yield {
        def walk(num: Int, depth: Int): Seq[Int] = {
          if (depth > 32) return Nil // cycle guard
          objs.get(num) match {
            case Some(o) if isPageLeaf(o.dict) => Seq(num)
            case Some(o) =>
              KidsArr.findFirstMatchIn(o.dict).toSeq.flatMap { km =>
                Ref.findAllMatchIn(km.group(1)).toSeq
                  .flatMap(r => walk(r.group(1).toInt, depth + 1))
              }
            case None => Nil
          }
        }
        walk(pagesRoot, 0)
      }).getOrElse(Nil)
    if (fromTree.nonEmpty) fromTree
    else objs.values.toSeq.filter(o => isPageLeaf(o.dict)).map(_.num).sorted
  }

  /** Content stream bytes for one page (single ref or array, in order). */
  def pageContent(objs: Map[Int, PdfObj], pageNum: Int): Array[Byte] = {
    val dict = objs.get(pageNum).map(_.dict).getOrElse("")
    val refs: Seq[Int] = ContentsArr.findFirstMatchIn(dict) match {
      case Some(am) => Ref.findAllMatchIn(am.group(1)).map(_.group(1).toInt).toSeq
      case None => ContentsOne.findFirstMatchIn(dict).map(_.group(1).toInt).toSeq
    }
    refs.flatMap(r => objs.get(r).map(decodedStream).getOrElse(Array.emptyByteArray)).toArray
  }

  /** Extract text from a content stream: a small operand-stack scanner
    * over `BT…ET` blocks. Strings accumulate; `Tj`/`TJ` emit; `'`/`"`
    * and `Td`/`TD`/`T*` break lines. */
  def contentText(content: Array[Byte]): String = {
    val s = new String(content, ISO_8859_1)
    val out = new StringBuilder
    val pending = new StringBuilder // operand strings since last operator
    var i = 0
    def emitLineBreak(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def emitPending(): Unit = { out.append(pending); pending.clear() }

    def parseLiteral(from: Int): Int = { // from points AT '('; returns index after ')'
      var j = from + 1
      var depth = 1
      while (j < s.length && depth > 0) {
        s.charAt(j) match {
          case '\\' if j + 1 < s.length =>
            s.charAt(j + 1) match {
              case 'n' => pending.append('\n'); j += 2
              case 'r' => pending.append('\r'); j += 2
              case 't' => pending.append('\t'); j += 2
              case 'b' => pending.append('\b'); j += 2
              case 'f' => pending.append('\f'); j += 2
              case '(' => pending.append('('); j += 2
              case ')' => pending.append(')'); j += 2
              case '\\' => pending.append('\\'); j += 2
              case '\n' => j += 2 // line continuation
              case '\r' => j += (if (j + 2 < s.length && s.charAt(j + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                var k = j + 1; var v = 0; var n = 0
                while (k < s.length && n < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                  v = v * 8 + (s.charAt(k) - '0'); k += 1; n += 1
                }
                pending.append(v.toChar); j = k
              case other => pending.append(other); j += 2
            }
          case '(' => depth += 1; pending.append('('); j += 1
          case ')' =>
            depth -= 1
            if (depth > 0) pending.append(')')
            j += 1
          case c => pending.append(c); j += 1
        }
      }
      j
    }
    def parseHex(from: Int): Int = { // from points AT '<' (not '<<'); returns after '>'
      var j = from + 1
      val hex = new StringBuilder
      while (j < s.length && s.charAt(j) != '>') {
        val c = s.charAt(j)
        if (!c.isWhitespace) hex.append(c)
        j += 1
      }
      if (hex.length % 2 == 1) hex.append('0')
      var k = 0
      while (k + 1 < hex.length) {
        pending.append(Integer.parseInt(hex.substring(k, k + 2), 16).toChar)
        k += 2
      }
      j + 1
    }

    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') i = parseLiteral(i)
      else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        // inline dict (e.g. BDC properties) — skip balanced
        val e = dictEnd(s, i); i = if (e > 0) e else i + 2
      }
      else if (c == '<') i = parseHex(i)
      else if (c == '[' || c == ']') i += 1 // TJ arrays: strings already accumulate
      else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace &&
          s.charAt(j) != '(' && s.charAt(j) != '<' && s.charAt(j) != '[' &&
          s.charAt(j) != ']' && s.charAt(j) != '/') j += 1
        s.substring(i, j) match {
          case "Tj" | "TJ" => emitPending()
          case "'" | "\"" => emitLineBreak(); emitPending()
          case "Td" | "TD" | "T*" => pending.clear(); emitLineBreak()
          case "BT" => pending.clear(); emitLineBreak()
          case "ET" => pending.clear()
          case _ => pending.clear() // other operators consume their operands
        }
        i = j
      }
      else i += 1
    }
    out.toString
  }

}

/** [[PageDecoder]] over [[MiniPdf]]: real PDF payloads → one
  * reference-shaped XHTML string per page, true page-tree order. */
final case class MiniPdfDecoder() extends PageDecoder {
  override def decode(payload: Array[Byte]): Either[String, Seq[String]] = {
    if (payload == null || payload.length < 8)
      return Left("cannot open document: empty payload")
    if (!new String(payload, 0, 5, ISO_8859_1).startsWith("%PDF-"))
      return Left("cannot open document: not a PDF header")
    try {
      val objs = MiniPdf.parseObjects(payload)
      if (objs.isEmpty) return Left("cannot open document: no PDF objects")
      val pages = MiniPdf.pageOrder(objs, payload)
      if (pages.isEmpty) return Left("cannot open document: no pages")
      Right(pages.map { p =>
        val text = MiniPdf.contentText(MiniPdf.pageContent(objs, p))
          .replaceAll("\\s+", " ").trim
        val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        s"<div><p>$esc</p></div>"
      })
    } catch {
      case e: Exception => Left(s"cannot open document: ${e.getMessage}")
    }
  }
}

/** Production router: real `%PDF-` payloads through [[MiniPdfDecoder]],
  * everything else through the deterministic fallback — so a mixed
  * corpus decodes what it can and the harness fixtures stay stable. */
final case class AutoPdfDecoder(fallback: PageDecoder = FakePdfDecoder())
    extends PageDecoder {
  override def decode(payload: Array[Byte]): Either[String, Seq[String]] =
    if (payload != null && payload.length >= 5 &&
        new String(payload, 0, 5, ISO_8859_1) == "%PDF-")
      MiniPdfDecoder().decode(payload)
    else fallback.decode(payload)

  override def drawings(payload: Array[Byte], pageNo: Int): String =
    fallback.drawings(payload, pageNo)
}

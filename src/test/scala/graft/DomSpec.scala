package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Dom, Extraction}

/** The real (JDK SGML) DOM parser vs the regex twins: agreement on the
  * reference-shaped inputs, strict wins on the malformed HTML no regex
  * handles (the gap the VERDICT's "What's missing #3" names). */
class DomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def domTextOf(html: String): String =
    Seq(html).toDF("s").select(Dom.domText(col("s")).as("r")).collect()(0).getString(0)
  private def regexTextOf(html: String): String =
    Seq(html).toDF("s").select(Extraction.stripTags(col("s")).as("r")).collect()(0).getString(0)
  private def words(s: String): Seq[String] = s.split("\\s+").filter(_.nonEmpty).toSeq

  test("agrees with regex strip on the ported reference page (word sequence)") {
    val page = "<h1> header \n header </h2>نکیمن دیلوت  <img jslfndl />هوضو هب ار бла бла"
    assert(words(domTextOf(page)) == words(regexTextOf(page)))
    val plain = "نکیمن دیلوت هوضو هب ار"
    assert(words(domTextOf(plain)) == words(regexTextOf(plain)))
  }

  test("img srcs via the parser match the regex extractor on well-formed tags") {
    val page = "a <img src=\"one.png\" width=\"270\" height=\"180\"/> b <img src='two.jpg'> c"
    val srcs = Seq(page).toDF("s")
      .select(Dom.domImgSrcs(col("s")).as("r")).collect()(0).getSeq[String](0)
    assert(srcs == Seq("one.png", "two.jpg"))
    val imgs = Dom.parse(page)._2
    assert(imgs.head.width == 270 && imgs.head.height == 180)
    assert(imgs(1).width == -1)
  }

  test("WIN: attribute value containing '>' does not truncate the tag") {
    val page = """before <p title="a>b">inside</p> after"""
    // the regex strip cuts at the first '>', leaving attribute residue
    assert(regexTextOf(page).contains("b\">") || !words(regexTextOf(page)).contains("inside")
      || words(regexTextOf(page)) != Seq("before", "inside", "after"))
    // the real parser tokenizes the attribute correctly
    assert(words(domTextOf(page)) == Seq("before", "inside", "after"))
  }

  test("WIN: character entities decode as text, not markup") {
    val page = "x &lt;div&gt; y &amp; z"
    assert(words(domTextOf(page)) == Seq("x", "<div>", "y", "&", "z"))
  }

  test("WIN: script and style payloads are dropped, not emitted as text") {
    val page = "keep <script>var a = 1 < 2; bad()</script> this <style>p{color:red}</style> text"
    assert(words(domTextOf(page)) == Seq("keep", "this", "text"))
  }

  test("unclosed and misnested tags recover") {
    val page = "<b>bold <i>both</b> italic trailing"
    assert(words(domTextOf(page)) == Seq("bold", "both", "italic", "trailing"))
  }

  // ------------------------------------------ charset detection (r14)

  test("charset: windows-1251 page with <meta charset> decodes correctly") {
    val html = "<html><head><meta charset=windows-1251></head>" +
      "<body><p>Привет мир сегодня</p></body></html>"
    val bytes = html.getBytes("windows-1251")
    assert(Dom.detectEncoding(bytes).name() == "windows-1251")
    assert(words(Dom.parse(Dom.decodeHtml(bytes))._1) ==
      Seq("Привет", "мир", "сегодня"))
  }

  test("charset: windows-1251 WITHOUT meta detects via the Cyrillic heuristic") {
    val html = "<html><body><p>Это просто русский текст без объявления кодировки, " +
      "но его байты почти целиком кириллица</p></body></html>"
    val bytes = html.getBytes("windows-1251")
    assert(Dom.detectEncoding(bytes).name() == "windows-1251")
    assert(Dom.decodeHtml(bytes).contains("русский текст"))
  }

  test("charset: Shift-JIS page decodes correctly (meta http-equiv form and bare)") {
    val metaHtml = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=Shift_JIS\"></head>" +
      "<body><p>こんにちは世界のページ</p></body></html>"
    val metaBytes = metaHtml.getBytes("Shift_JIS")
    assert(Dom.detectEncoding(metaBytes).name() == "Shift_JIS")
    assert(Dom.decodeHtml(metaBytes).contains("こんにちは世界のページ"))
    // no meta: lead-byte heuristic
    val bare = "<html><body><p>こんにちは世界のページへようこそ皆さん</p></body></html>"
      .getBytes("Shift_JIS")
    assert(Dom.detectEncoding(bare).name() == "Shift_JIS")
    assert(Dom.decodeHtml(bare).contains("ようこそ"))
  }

  test("charset: UTF-8 fast path (with and without BOM), UTF-16 BOMs") {
    val utf8 = "<p>héllo wörld — ünïcode</p>".getBytes("UTF-8")
    assert(Dom.detectEncoding(utf8).name() == "UTF-8")
    assert(Dom.decodeHtml(utf8).contains("héllo wörld"))
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8
    assert(Dom.detectEncoding(bom).name() == "UTF-8")
    assert(Dom.decodeHtml(bom).startsWith("<p>héllo"))
    val u16le = "<p>sixteen</p>".getBytes("UTF-16LE")
    val u16leBom = Array(0xFF.toByte, 0xFE.toByte) ++ u16le
    assert(Dom.detectEncoding(u16leBom).name() == "UTF-16LE")
    assert(Dom.decodeHtml(u16leBom) == "<p>sixteen</p>")
    val u16be = "<p>sixteen</p>".getBytes("UTF-16BE")
    val u16beBom = Array(0xFE.toByte, 0xFF.toByte) ++ u16be
    assert(Dom.decodeHtml(u16beBom) == "<p>sixteen</p>")
  }

  test("charset: XML declaration encoding honored (XHTML without meta)") {
    val xhtml = "<?xml version=\"1.0\" encoding=\"windows-1251\"?>" +
      "<html><body><p>Текст без меты</p></body></html>"
    val bytes = xhtml.getBytes("windows-1251")
    assert(Dom.detectEncoding(bytes).name() == "windows-1251")
    assert(Dom.decodeHtml(bytes).contains("Текст без меты"))
  }

  test("charset: plain ASCII stays UTF-8; latin high bytes fall back to windows-1252") {
    assert(Dom.detectEncoding("<p>plain ascii</p>".getBytes("US-ASCII")).name() == "UTF-8")
    val w1252 = "<p>café résumé naïve</p>".getBytes("windows-1252")
    assert(Dom.detectEncoding(w1252).name() == "windows-1252")
    assert(Dom.decodeHtml(w1252).contains("café résumé naïve"))
  }

  test("charset: strict UTF-8 validator rejects overlongs, surrogates, bad trails") {
    import graft.functions.Dom.isValidUtf8
    assert(isValidUtf8("plain".getBytes("UTF-8")))
    assert(isValidUtf8("héllo — 世界 🎉".getBytes("UTF-8")))
    assert(!isValidUtf8(Array(0xC0.toByte, 0xAF.toByte))) // overlong '/'
    assert(!isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate
    assert(!isValidUtf8(Array(0xE4.toByte, 0x41.toByte, 0x42.toByte))) // bad trail
    assert(!isValidUtf8(Array(0xF5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte))) // >U+10FFFF lead
    assert(!isValidUtf8("truncated é".getBytes("UTF-8").dropRight(1)))
  }

  test("meta robots: noindex/none detected in either attribute order and quoting; " +
       "nofollow-only and unrelated metas pass") {
    import graft.functions.Dom.robotsNoindex
    assert(robotsNoindex("""<head><meta name="robots" content="noindex, follow"></head>"""))
    assert(robotsNoindex("""<meta content='NONE' name='robots'>"""))
    assert(robotsNoindex("""<META NAME=robots CONTENT=noindex>"""))
    assert(!robotsNoindex("""<meta name="robots" content="nofollow">"""))
    assert(!robotsNoindex("""<meta name="description" content="noindex is a word">"""))
    assert(!robotsNoindex("""<meta name="robots" content="index, follow">"""))
    // noindexfoo must not match the noindex directive
    assert(!robotsNoindex("""<meta name="robots" content="noindexfoo">"""))
    assert(!robotsNoindex(""))
    // bytes column form, charset-detected
    val rows = Seq(
      ("block", "<html><head><meta name=\"robots\" content=\"noindex\"></head></html>".getBytes("UTF-8")),
      ("allow", "<html><head></head><body>ok</body></html>".getBytes("UTF-8")))
    val out = rows.toDF("id", "payload")
      .select(col("id"), Dom.metaRobotsNoindex(col("payload")).as("blocked"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("block") && !out("allow"))
  }

  test("charset: end-to-end bytes column through detection + DOM parse") {
    val rows: Seq[(String, Array[Byte])] = Seq(
      ("ru", "<html><body>Русская страница здесь</body></html>".getBytes("windows-1251")),
      ("ja", "<html><body>こんにちは世界のページへようこそ</body></html>".getBytes("Shift_JIS")),
      ("en", "<html><body>plain english page</body></html>".getBytes("UTF-8")))
    val out = rows.toDF("id", "payload")
      .select(col("id"), Dom.detectedCharset(col("payload")).as("cs"),
        Dom.domTextBytes(col("payload")).as("text"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out("ru")._1 == "windows-1251" && out("ru")._2.contains("Русская страница"))
    assert(out("ja")._1 == "Shift_JIS" && out("ja")._2.contains("こんにちは"))
    assert(out("en")._1 == "UTF-8" && out("en")._2 == "plain english page")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Extraction, TextAnalysis}

/** Port of the reference's extractor unit tests
  * (`/root/reference/tests/test_extractor.py:6-64`) — same inputs, same
  * expected outputs, over the Catalyst expression layer. */
class ExtractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.as("r")).collect()(0).getString(0)
  private def evalInt(c: org.apache.spark.sql.Column, input: String): Int =
    Seq(input).toDF("s").select(c.cast("int").as("r")).collect()(0).getInt(0)

  val farsi = "نکیمن دیلوت هوضو هب ار"
  val mixed = "<h1> header \n header </h2>نکیمن دیلوت  <img jslfndl />هوضو هب ار бла бла"

  test("word count: RTL Farsi plain text = 5 (test_extractor.py:6-9)") {
    assert(evalInt(Extraction.wordCount(col("s")), farsi) == 5)
  }

  test("word count: mixed HTML/RTL/Cyrillic after tag strip = 9 (test_extractor.py:11-13)") {
    assert(evalInt(Extraction.wordCount(Extraction.stripTags(col("s"))), mixed) == 9)
  }

  test("img extraction: none in plain text (test_extractor.py:16-18)") {
    assert(evalInt(size(Extraction.imgTags(col("s"))), farsi) == 0)
  }

  test("img extraction: multiline base64 data-URI tag survives intact (test_extractor.py:20-24)") {
    val imgTag = "<img width=\"270\" height=\"180\" src=\"data:image/jpeg;base64,\nABC\nDEF/>"
    val page = s"<h1> header </h2>نکیمن دیلوت  $imgTag"
    // DOTALL pattern must capture through the embedded newlines
    val got = Seq(page).toDF("s")
      .select(Extraction.imgTags(col("s")).as("r")).collect()(0).getSeq[String](0)
    assert(got == Seq(imgTag))
    assert(evalInt(Extraction.imgDim(lit(imgTag), "width"), "x") == 270)
    assert(evalInt(Extraction.imgDim(lit(imgTag), "height"), "x") == 180)
    assert(evalInt(Extraction.imgDim(lit("<img src=\"x\"/>"), "width"), "x") == 0)
  }

  test("strip all tags → newline (test_extractor.py:27-32)") {
    assert(evalStr(Extraction.stripTags(col("s")), farsi) == farsi)
    val page = "<h1> header \n header </h2>نکیمن دیلوت  <img jslfndl \n\n\n />هوضو هب ار бла бла"
    assert(evalStr(Extraction.stripTags(col("s")), page) ==
      "\n header \n header \nنکیمن دیلوت  \nهوضو هب ار бла бла")
  }

  test("strip all tags except img (test_extractor.py:35-42, regex semantics)") {
    assert(evalStr(Extraction.stripTagsExceptImg(col("s")), farsi) == farsi)
    val page = "<h2> header </h2>نکیمن دیلوت  <img src=\"jslfndl\" />هوضو هب ار бла бла"
    val got = evalStr(Extraction.stripTagsExceptImg(col("s")), page)
    assert(got.contains("<img src=\"jslfndl\" />"))
    assert(!got.contains("<h2>") && !got.contains("</h2>"))
  }

  test("remove one img tag literally (test_extractor.py:45-48)") {
    val img = "<img jslfndl \n\n\n />"
    val page = s"<h2> header \n header </h2>نکیمن دیلوت  ${img}هوضو هب ار бла бла"
    assert(evalStr(Extraction.removeImgTag(col("s"), lit(img)), page) ==
      "<h2> header \n header </h2>نکیمن دیلوت  هوضو هب ار бла бла")
  }

  test("digit removal: [.\\d]+ → '' incl. inside tags (test_extractor.py:51-53)") {
    val page = "<h2> 7494 header \n header </h2>نکیمن دیلوت  <img jslfndl \n\n\n />هوضو هب ار бла бла 34-89 34.67"
    assert(evalStr(Extraction.removeDigits(col("s")), page) ==
      "<h>  header \n header </h>نکیمن دیلوت  <img jslfndl \n\n\n />هوضو هب ار бла бла - ")
  }

  test("language detect fa/ru/en (test_extractor.py:56-64)") {
    assert(TextAnalysis.detectLanguage("خداحافظ") == "fa")
    assert(TextAnalysis.detectLanguage("а неправильный формат идентификатора дн назад") == "ru")
    assert(TextAnalysis.detectLanguage("OK I fixed the Python bindings to always return 3 languages even") == "en")
  }

  test("language detect extended scripts") {
    assert(TextAnalysis.detectLanguage("这是一个中文句子，用来测试语言检测") == "zh")
    assert(TextAnalysis.detectLanguage("これは日本語のテスト文です") == "ja")
    assert(TextAnalysis.detectLanguage("El perro corre por la calle y no se detiene") == "es")
    assert(TextAnalysis.detectLanguage("Der Hund läuft und die Katze schläft nicht") == "de")
    assert(TextAnalysis.detectLanguage("") == "un")
    assert(TextAnalysis.detectLanguage("12345 !!!") == "un")
  }

  test("empty-page filter (downloader.py:194-195)") {
    val df = Seq(("a", "real content"), ("b", " \n\t  "), ("c", "")).toDF("k", "s")
    val kept = df.filter(Extraction.nonEmptyPage(col("s"))).select("k").as[String].collect().toSet
    assert(kept == Set("a"))
  }

  test("hash compute md5/sha256/sha512 (downloader.py:423-425)") {
    assert(evalStr(Extraction.contentHash(col("s"), "md5"), "abc") ==
      "900150983cd24fb0d6963f7d28e17f72")
    assert(evalStr(Extraction.contentHash(col("s"), "sha256"), "abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(evalStr(Extraction.contentHash(col("s"), "sha512"), "abc").length == 128)
    intercept[IllegalArgumentException](Extraction.contentHash(col("s"), "crc32"))
  }

  test("key synthesis: zero-padded shard*10^oom + index (downloader.py:69-75)") {
    val df = Seq((3L, 7L)).toDF("shard", "i")
    val got = df.select(Extraction.computeKey(col("shard"), col("i"), 4, 5).as("k"))
      .as[String].collect()(0)
    assert(got == "000030007")
    assert(evalStr(Extraction.pageKey(lit("000030007"), lit(2)), "x") == "0000300072")
  }

  test("img size/ratio filter keeps big square-ish, drops small or stretched") {
    val big = "<img width=\"200\" height=\"100\"/>"     // ratio 2
    val small = "<img width=\"20\" height=\"100\"/>"
    val stretched = "<img width=\"900\" height=\"100\"/>" // ratio 9
    val df = Seq(Seq(big, small, stretched)).toDF("imgs")
    val kept = df.select(Extraction.filterImgs(col("imgs"), minSize = 50, maxRatio = 3.0).as("r"))
      .collect()(0).getSeq[String](0)
    assert(kept == Seq(big))
  }
}
